"""Panorama projection + feature-based registration tests (fbr)."""

import numpy as np
import pytest

from tpu3dtk.core import math3d
from tpu3dtk.ops.panorama import PanoramaParams, project_panorama
from tpu3dtk.models import fbr
from tests.conftest import make_room_cloud


def test_panorama_projection_basic(rng):
    pts = make_room_cloud(rng, n=5000, size=600.0) - 300.0  # center origin
    pano = project_panorama(pts, PanoramaParams(width=360, height=180))
    filled = (pano.index >= 0).sum()
    assert filled > 1000
    # ranges plausible
    r = pano.range[pano.index >= 0]
    assert (r > 0).all() and r.max() < 600 * np.sqrt(3)
    # back-projection identity
    ys, xs = np.where(pano.index >= 0)
    idx, ok = pano.back_project(np.stack([xs[:50], ys[:50]], 1).astype(float))
    assert ok.all()
    np.testing.assert_allclose(
        np.linalg.norm(pts[idx], axis=1), pano.range[ys[:50], xs[:50]], rtol=1e-5
    )


@pytest.mark.parametrize("method", ["equirectangular", "cylindrical", "mercator"])
def test_panorama_methods(method, rng):
    pts = rng.normal(0, 100, (2000, 3))
    pano = project_panorama(pts, PanoramaParams(width=180, height=90, method=method))
    assert (pano.index >= 0).sum() > 100


def test_ransac_rigid(rng):
    d = rng.uniform(-100, 100, (50, 3))
    T_true = np.asarray(math3d.euler_to_matrix4([10.0, -5.0, 3.0], [0.1, -0.05, 0.2]))
    m = np.asarray(math3d.transform3(T_true, d))
    # corrupt 30% of matches
    m2 = m.copy()
    out = rng.choice(50, 15, replace=False)
    m2[out] += rng.uniform(-300, 300, (15, 3))
    T, inl = fbr.estimate_rigid_ransac(m2, d, iters=300, inlier_dist=5.0)
    np.testing.assert_allclose(T, T_true, atol=0.05)
    assert inl.sum() >= 30


def test_register_fbr_end_to_end(rng):
    """Structured scene, data rotated about the up axis: fbr must
    recover the yaw rotation approximately."""
    world = make_room_cloud(rng, n=20000, size=800.0) - 400.0
    # add structure: a few dense blobs for distinctive features
    for c in ([100, 50, 200], [-200, 0, 100], [50, -100, -250]):
        world = np.concatenate([world, np.asarray(c) + rng.normal(0, 15, (3000, 3))])
    theta = np.array([0.0, 0.15, 0.0])
    T_true = np.asarray(math3d.euler_to_matrix4(np.zeros(3), theta))
    data = np.asarray(math3d.transform3(math3d.m4inv(T_true), world))
    res = fbr.register_fbr(
        world, data,
        fbr.FbrParams(
            panorama=PanoramaParams(width=720, height=360),
            detector="orb", ransac_iters=800, inlier_dist=20.0,
        ),
    )
    assert res["n_inliers"] >= 10
    # recovered yaw close to truth
    th, _ = math3d.matrix4_to_euler(res["T"])
    np.testing.assert_allclose(np.asarray(th)[1], 0.15, atol=0.03)
