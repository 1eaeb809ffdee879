"""Round-4 converter/normals tail: frame_to_graph, convergence,
graph_balancer CLI, sICP, scan_diff2d, scan2features, normals variants
(ref src/slam6d/{frame_to_graph,convergence,sICP,scan_diff2d,
scan2features}.cc, src/slam6d/normals.cc:705, src/normals/
calc_normals.cc)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3dtk.core import math3d
from tpu3dtk.io import converters as cv
from tpu3dtk.io import frames as frames_io
from tests.conftest import make_room_cloud


def _write_frames(tmp_path, n=4, rng=None):
    rng = rng or np.random.default_rng(5)
    mats = []
    for k in range(n):
        T = np.asarray(
            math3d.euler_to_matrix4(
                rng.uniform(-50, 50, 3), rng.uniform(-0.5, 0.5, 3)
            )
        )
        hist = np.stack([np.eye(4), T])
        frames_io.write_frames(
            str(tmp_path / f"scan{k:03d}.frames"), hist, [2, 2]
        )
        mats.append(T)
    return mats


def test_frames_to_graph(tmp_path):
    mats = _write_frames(tmp_path)
    out = str(tmp_path / "graph.txt")
    n = cv.frames_to_graph(str(tmp_path), out)
    assert n == 4
    rows = np.loadtxt(out)
    assert rows.shape == (4, 7)
    for row, T in zip(rows, mats):
        np.testing.assert_allclose(row[:3], T[:3, 3], atol=1e-6)
        q = np.asarray(math3d.matrix4_to_quat(T))
        # quaternion sign is a convention; compare up to sign
        assert min(
            np.abs(row[3:] - q).max(), np.abs(row[3:] + q).max()
        ) < 1e-6


def test_convergence_trace(tmp_path):
    rng = np.random.default_rng(6)
    hist = []
    for it in range(5):
        hist.append(
            np.asarray(
                math3d.euler_to_matrix4(rng.uniform(-10, 10, 3), np.zeros(3))
            )
        )
    types = [frames_io.AlgoType.ICP] * 3 + [frames_io.AlgoType.LUM] * 2
    frames_io.write_frames(
        str(tmp_path / "scan000.frames"), np.stack(hist),
        [int(t) for t in types],
    )
    rows = cv.convergence_trace(str(tmp_path), 0, "global")
    assert rows.shape == (5, 6)
    rows_icp = cv.convergence_trace(str(tmp_path), 0, "local")
    assert rows_icp.shape == (3, 6)
    np.testing.assert_allclose(rows[0, :3], hist[0][:3, 3], atol=1e-9)


def test_sicp_align_known_transform(rng):
    pts = make_room_cloud(rng, n=500, size=300.0)
    T_true = np.asarray(
        math3d.euler_to_matrix4([10.0, -6.0, 4.0], [0.05, -0.03, 0.08])
    )
    local = np.asarray(math3d.transform3(np.asarray(math3d.m4inv(T_true)), pts))
    T = cv.sicp_align(pts, local)
    np.testing.assert_allclose(T, T_true, atol=1e-3)


def test_scan_diff2d(tmp_path, dat_dir):
    out = str(tmp_path / "diff.png")
    img = cv.scan_diff2d(dat_dir, out, id_a=0, id_b=1, max_dist=30.0)
    assert os.path.exists(out)
    assert img.ndim == 3 and img.shape[2] == 3
    # both the footprint and the difference layer must be present
    assert (img == 160).any()
    assert (img[..., 0] == 255).any()


def test_scan_to_features(tmp_path, dat_dir):
    n = cv.scan_to_features(
        dat_dir, str(tmp_path), reduce_voxel=40.0, k=12
    )
    assert n == 3
    rows = np.loadtxt(str(tmp_path / "scan000.feat"))
    assert rows.shape[1] == 7
    norms = np.linalg.norm(rows[:, 3:6], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    assert (rows[:, 6] >= 0).all() and (rows[:, 6] <= 1.0 / 3 + 1e-3).all()


def _wall_cloud(rng, n=2000):
    """Flat y=0 wall + known normal (0,1,0)."""
    p = rng.uniform(0, 400, (n, 3))
    p[:, 1] = 0.0
    return p


@pytest.mark.parametrize("method", ["adaptive", "apx"])
def test_normals_variants_flat_wall(rng, method):
    from tpu3dtk.ops import normals as nrm

    pts = _wall_cloud(rng)
    vp = jnp.asarray([200.0, 500.0, 200.0], jnp.float32)  # above the wall
    mask = jnp.ones(len(pts), bool)
    if method == "adaptive":
        n = np.asarray(
            nrm.estimate_normals_adaptive_knn(
                jnp.asarray(pts, jnp.float32), mask, vp
            )
        )
    else:
        n = np.asarray(
            nrm.estimate_normals_apx_knn(
                jnp.asarray(pts, jnp.float32), mask, vp, k=16, subsample=2
            )
        )
    dot = n @ np.array([0.0, 1.0, 0.0])
    assert (np.abs(dot) > 0.99).mean() > 0.97
    assert (dot > 0).mean() > 0.97  # oriented toward the viewpoint


def test_normals_panorama_sphere(rng):
    """Points on a sphere around the scanner: range-image normals must
    point radially (toward the origin viewpoint)."""
    from tpu3dtk.ops import normals as nrm

    d = rng.normal(size=(40000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # keep within the panorama's vertical FOV (+-60 deg)
    keep = np.abs(np.arcsin(d[:, 1])) < np.deg2rad(55)
    pts = 300.0 * d[keep]
    # image sized so 3x3 pixel neighborhoods are populated
    n = nrm.estimate_normals_panorama(pts, width=180, height=60)
    radial = -(pts / np.linalg.norm(pts, axis=1, keepdims=True))
    dot = np.abs((n * radial).sum(1))
    assert np.median(dot) > 0.95


def test_graph_balancer_cli(tmp_path):
    from tpu3dtk.cli.convert import main as cmain

    net = str(tmp_path / "g.net")
    with open(net, "w") as f:
        f.write("4\n4\n0 1\n1 2\n2 3\n0 3\n")
    out = str(tmp_path / "w.txt")
    assert cmain(["graphbalancer", net, "-s", "0", "-e", "3", "-o", out]) == 0
    w = np.loadtxt(out)
    assert w.shape == (4,)
    assert w[0] == 0.0 and w[3] == 1.0
