"""Voxel reduction tests (semantics of BOctTree reduction modes,
scan.cc:588-601)."""

import numpy as np
import jax.numpy as jnp

from tpu3dtk.ops import reduction


def _grid_cloud():
    # 8 clusters at the corners of a 100-cube, 10 points each
    rng = np.random.default_rng(7)
    corners = np.array(
        [[i, j, k] for i in (0, 100) for j in (0, 100) for k in (0, 100)],
        dtype=np.float64,
    )
    pts = np.concatenate(
        [c + rng.uniform(0, 5, size=(10, 3)) for c in corners], axis=0
    )
    return pts, corners


def test_center_mode_one_per_voxel():
    pts, corners = _grid_cloud()
    out = reduction.reduce_scan(pts, voxel_size=40.0, nrpts=0)
    assert len(out) == 8
    # each representative is a voxel center within 20/2*sqrt(3) of a corner cluster
    d = np.linalg.norm(out[:, None, :] - corners[None], axis=-1).min(axis=1)
    assert (d <= 40.0 * np.sqrt(3)).all()


def test_mean_mode():
    pts, corners = _grid_cloud()
    out = reduction.reduce_scan(pts, voxel_size=40.0, nrpts=-1)
    assert len(out) == 8
    # means of clusters: each matches the mean of the 10 points near a corner
    for c in corners:
        sel = np.linalg.norm(pts - c, axis=1) < 10
        m = pts[sel].mean(axis=0)
        assert np.min(np.linalg.norm(out - m, axis=1)) < 1e-4


def test_random_mode_picks_actual_points():
    pts, _ = _grid_cloud()
    out = reduction.reduce_scan(pts, voxel_size=40.0, nrpts=1, seed=3)
    assert len(out) == 8
    # every representative is one of the input points
    d = np.linalg.norm(out[:, None, :] - pts[None], axis=-1).min(axis=1)
    assert (d < 1e-5).all()


def test_random_mode_nrpts_multiple():
    pts, _ = _grid_cloud()
    out = reduction.reduce_scan(pts, voxel_size=40.0, nrpts=3)
    assert len(out) == 24


def test_no_reduction_passthrough():
    pts, _ = _grid_cloud()
    out = reduction.reduce_scan(pts, voxel_size=0.0, nrpts=0)
    assert len(out) == len(pts)


def test_masked_padding():
    pts, _ = _grid_cloud()
    padded = np.zeros((128, 3), dtype=np.float32)
    padded[: len(pts)] = pts
    mask = np.zeros(128, dtype=bool)
    mask[: len(pts)] = True
    out, omask = reduction.voxel_reduce(
        jnp.asarray(padded), jnp.asarray(mask), 40.0, mode="mean"
    )
    assert int(omask.sum()) == 8
