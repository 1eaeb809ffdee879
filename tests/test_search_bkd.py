"""Tests for the kd search variants (ops.search; ref
include/slam6d/kdTreeImpl.h:491-828) and the Bkd dynamic forest
(ops.bkd; ref include/slam6d/bkd.h:47-135)."""

import numpy as np
import jax.numpy as jnp

from tpu3dtk.ops import search
from tpu3dtk.ops.bkd import BkdForest
from tests.conftest import make_room_cloud


def _brute_range(query, model, max_dist2):
    d2 = ((query[:, None, :] - model[None, :, :]) ** 2).sum(-1)
    return d2 < max_dist2


def test_fixed_range_search_exact(rng):
    model = rng.uniform(0, 300, (800, 3)).astype(np.float32)
    query = rng.uniform(0, 300, (100, 3)).astype(np.float32)
    md2 = 40.0**2
    truth = _brute_range(query.astype(np.float64), model.astype(np.float64), md2)
    idx, d2, found, count = search.fixed_range_search(
        jnp.asarray(query), jnp.ones(100, bool),
        jnp.asarray(model), jnp.ones(800, bool), jnp.float32(md2), K=64,
    )
    count = np.asarray(count)
    assert (count < 64).all()  # exact
    np.testing.assert_array_equal(count, truth.sum(1))
    # every returned found index is truly in range; sets match
    for q in range(100):
        got = set(np.asarray(idx)[q][np.asarray(found)[q]])
        assert got == set(np.flatnonzero(truth[q]))
    # sorted by distance
    d2v = np.asarray(d2)
    for q in range(100):
        k = count[q]
        assert (np.diff(d2v[q][:k]) >= -1e-3).all()


def test_fixed_range_truncation_flag(rng):
    model = rng.uniform(0, 10, (500, 3)).astype(np.float32)  # dense
    query = model[:4] + 0.1
    idx, d2, found, count = search.fixed_range_search(
        jnp.asarray(query), jnp.ones(4, bool),
        jnp.asarray(model), jnp.ones(500, bool), jnp.float32(100.0), K=8,
    )
    assert (np.asarray(count) == 8).all()  # truncated -> count == K


def test_fixed_range_along_dir(rng):
    model = rng.uniform(0, 200, (600, 3)).astype(np.float32)
    query = rng.uniform(0, 200, (50, 3)).astype(np.float32)
    dirs = rng.normal(size=(50, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    md2 = 15.0**2
    diff = model[None] - query[:, None]
    proj = (diff * dirs[:, None]).sum(-1)
    truth = (diff**2).sum(-1) - proj**2 < md2
    idx, d2, found, count = search.fixed_range_search_along_dir(
        jnp.asarray(query), jnp.asarray(dirs, jnp.float32),
        jnp.ones(50, bool), jnp.asarray(model), jnp.ones(600, bool),
        jnp.float32(md2), K=128,
    )
    count = np.asarray(count)
    assert (count < 128).all()
    np.testing.assert_array_equal(count, truth.sum(1))


def test_aabb_and_segment(rng):
    model = rng.uniform(0, 100, (1000, 3)).astype(np.float32)
    lo = np.array([20, 30, 40], np.float32)
    hi = np.array([60, 70, 80], np.float32)
    m = np.asarray(
        search.aabb_search(
            jnp.asarray(model), jnp.ones(1000, bool),
            jnp.asarray(lo), jnp.asarray(hi),
        )
    )
    truth = ((model >= lo) & (model <= hi)).all(1)
    np.testing.assert_array_equal(m, truth)

    p1 = np.array([0.0, 0.0, 0.0], np.float32)
    p2 = np.array([100.0, 0.0, 0.0], np.float32)
    seg = p2 - p1
    t = np.clip((model - p1) @ seg / (seg @ seg), 0, 1)
    proj = p1 + t[:, None] * seg
    d2t = ((model - proj) ** 2).sum(1)
    idx, d2, found = search.segment_search_1nn(
        jnp.asarray(p1), jnp.asarray(p2),
        jnp.asarray(model), jnp.ones(1000, bool), jnp.float32(1e6),
    )
    assert int(idx) == int(np.argmin(d2t))
    mall = np.asarray(
        search.segment_search_all(
            jnp.asarray(p1), jnp.asarray(p2),
            jnp.asarray(model), jnp.ones(1000, bool), jnp.float32(20.0**2),
        )
    )
    np.testing.assert_array_equal(mall, d2t < 400.0)


def test_bkd_insert_query_matches_static(rng):
    pts = make_room_cloud(rng, n=3000, size=500.0).astype(np.float32)
    forest = BkdForest(buffer_size=256)
    # streaming insert in chunks -> multiple levels
    for k in range(0, len(pts), 500):
        forest.insert(pts[k : k + 500])
    assert forest.size() == len(pts)
    q = pts[rng.integers(0, len(pts), 64)] + rng.normal(0, 2, (64, 3)).astype(
        np.float32
    )
    best_pt, d2, found = forest.find_closest(q, np.ones(64, bool), 625.0)
    # oracle
    from scipy.spatial import cKDTree

    dt, it = cKDTree(pts).query(q)
    assert found.all()
    np.testing.assert_allclose(d2, dt**2, atol=1e-2)
    np.testing.assert_allclose(best_pt, pts[it], atol=1e-4)


def test_bkd_remove(rng):
    pts = rng.uniform(0, 100, (600, 3)).astype(np.float32)
    forest = BkdForest(pts, buffer_size=128)
    victim = pts[10]
    n = forest.remove(victim)
    assert n >= 1
    assert forest.size() == len(pts) - n
    best_pt, d2, found = forest.find_closest(
        victim[None], np.ones(1, bool), 1e-4
    )
    # the removed point must no longer match at zero distance
    assert not found[0] or d2[0] > 1e-6


def test_bkd_range_search(rng):
    pts = rng.uniform(0, 200, (900, 3)).astype(np.float32)
    forest = BkdForest(buffer_size=200)
    forest.insert(pts)
    q = pts[:16]
    ptsr, d2, found, count = forest.fixed_range_search(
        q, np.ones(16, bool), 25.0**2, K=64
    )
    truth = _brute_range(q.astype(np.float64), pts.astype(np.float64), 625.0)
    np.testing.assert_array_equal(count, truth.sum(1))


def test_spherical_quadtree_search(rng):
    """Cone search matches the exact angular filter (ref
    src/spherical_quadtree QuadNode::search)."""
    from tpu3dtk.ops.sphquad import SphericalQuadtree

    d = rng.normal(size=(5000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = d * rng.uniform(50, 200, (5000, 1))
    qt = SphericalQuadtree(pts, levels=5)
    p = np.array([1.0, 0.3, -0.2])
    p /= np.linalg.norm(p)
    r = 0.3
    got = np.sort(qt.search(p, r))
    truth = np.sort(np.nonzero(d @ p >= np.cos(r))[0])
    np.testing.assert_array_equal(got, truth)


def test_spherical_quadtree_reduce(rng):
    from tpu3dtk.ops.sphquad import SphericalQuadtree

    d = rng.normal(size=(8000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    qt = SphericalQuadtree(d, levels=6)
    sel = qt.reduce(theta=0.2, numpts=1)
    assert 0 < len(sel) < 4000
    # the kept directions are angularly spread: pairwise min angle of a
    # sample must exceed a fraction of theta
    sub = d[sel[:200]]
    cos = sub @ sub.T
    np.fill_diagonal(cos, -1)
    # no two kept samples nearly coincide
    assert np.arccos(np.clip(cos.max(), -1, 1)) > 0.01
