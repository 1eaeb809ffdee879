"""Normal estimation + point-to-plane/normal-shoot pairing tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3dtk.core import math3d
from tpu3dtk.ops import knn, nn, normals
from tpu3dtk.models import icp
from tests.conftest import make_room_cloud


def test_knn_matches_numpy(rng):
    q = rng.uniform(0, 100, (100, 3)).astype(np.float32)
    m = rng.uniform(0, 100, (300, 3)).astype(np.float32)
    idx, d2 = knn.knn_brute(
        jnp.asarray(q), jnp.ones(100, bool), jnp.asarray(m), jnp.ones(300, bool), k=5
    )
    full = ((q[:, None] - m[None]) ** 2).sum(-1)
    ref = np.sort(full, axis=1)[:, :5]
    np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1), ref, rtol=1e-4, atol=1e-2)


def test_plane_normals():
    """Points on the y=0 plane must get normals = +-y."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 100, (500, 3)).astype(np.float32)
    pts[:, 1] = 0.0
    mask = np.ones(500, bool)
    vp = np.array([50.0, 100.0, 50.0], np.float32)  # viewpoint above
    n = np.asarray(
        normals.estimate_normals_knn(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(vp), k=12)
    )
    np.testing.assert_allclose(np.abs(n[:, 1]), 1.0, atol=1e-4)
    # oriented toward viewpoint (+y)
    assert (n[:, 1] > 0).all()


def test_smallest_eigenvector_analytic(rng):
    for _ in range(20):
        A = rng.normal(size=(3, 3))
        A = A @ A.T + np.diag([3.0, 2.0, 0.1])
        v = np.asarray(normals.smallest_eigenvector_sym3(jnp.asarray(A[None]))[0])
        w, V = np.linalg.eigh(A)
        ref = V[:, 0]
        d = abs(float(np.dot(v, ref)))
        assert d > 0.999, (d, w)


def test_nn_along_normal():
    """Normal shooting: picks the point nearest the ray, not euclidean NN."""
    q = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)  # shoot along +y
    # point A: 3 units off-axis; point B: 100 along y but only 1 off-axis
    m = jnp.asarray([[3.0, 0.0, 0.0], [1.0, 100.0, 0.0]], jnp.float32)
    idx, d2, found = nn.nn_brute_line(
        q, d, jnp.ones(1, bool), m, jnp.ones(2, bool), 16.0
    )
    assert int(idx[0]) == 1
    np.testing.assert_allclose(float(d2[0]), 1.0, atol=1e-4)


def test_icp_closest_plane_converges(rng):
    cloud = make_room_cloud(rng, n=2000)
    cap = 2048
    pts = np.zeros((cap, 3), np.float32)
    pts[: len(cloud)] = cloud
    mask = np.zeros(cap, bool)
    mask[: len(cloud)] = True
    vp = np.array([500.0, 500.0, 500.0], np.float32)
    nrm = np.asarray(
        normals.estimate_normals_knn(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(vp), k=12)
    )
    T_pert = np.asarray(
        math3d.euler_to_matrix4([4.0, -3.0, 2.0], [0.01, 0.015, -0.01]),
        dtype=np.float32,
    )
    res = icp.icp_pair(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray(T_pert),
        max_dist_match2=625.0, epsilon=1e-7, max_iterations=80,
        pairing="closest_plane", target_normals_local=jnp.asarray(nrm),
    )
    np.testing.assert_allclose(np.asarray(res.T), np.eye(4), atol=0.1)


def test_icp_along_normal_recovers_offset(rng):
    """Normal shooting constrains motion along the surface normal: a
    single plane offset along its normal must be pulled back (sliding
    directions are unconstrained by design)."""
    cap = 2048
    plane = rng.uniform(0, 500, (2000, 3)).astype(np.float32)
    plane[:, 1] = 0.0
    pts = np.zeros((cap, 3), np.float32)
    pts[:2000] = plane
    mask = np.zeros(cap, bool)
    mask[:2000] = True
    nrm = np.zeros((cap, 3), np.float32)
    nrm[:2000, 1] = 1.0
    T_pert = np.asarray(
        math3d.euler_to_matrix4([0.0, 8.0, 0.0], [0.0, 0.0, 0.0]),
        dtype=np.float32,
    )
    res = icp.icp_pair(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray(T_pert),
        max_dist_match2=400.0, epsilon=1e-7, max_iterations=60,
        pairing="along_normal", target_normals_local=jnp.asarray(nrm),
    )
    assert abs(float(res.T[1, 3])) < 0.5  # y offset recovered
