"""Sharded LUM covariance assembly == single-device batched kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dtk.models import graphslam as gs
from tpu3dtk.parallel import lum_shard, mesh as mesh_mod
from tests.conftest import make_room_cloud


def test_sharded_links_match_batched(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = mesh_mod.make_mesh(8, axes=("points",))
    S, N = 5, 1024
    world = make_room_cloud(rng, n=N, size=500.0)
    pts = np.zeros((S, N, 3), np.float32)
    msk = np.zeros((S, N), bool)
    for s in range(S):
        jitter = rng.normal(0, 1.0, world.shape)
        pts[s, : len(world)] = world + jitter
        msk[s, : len(world)] = True
    links = np.array([[i, i + 1] for i in range(S - 1)] + [[0, 4]], np.int32)

    C1, CD1, m1 = gs.link_covariances(
        jnp.asarray(pts), jnp.asarray(msk), jnp.asarray(links), jnp.float32(2500.0)
    )
    C2, CD2, m2, overflow = lum_shard.link_covariances_sharded(
        mesh, pts, msk, links, 2500.0
    )
    assert not overflow
    np.testing.assert_allclose(np.asarray(m1), m2)
    np.testing.assert_allclose(np.asarray(C1), C2, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(CD1), CD2, rtol=1e-4, atol=1e-1)


def test_sharded_links_grid_match_brute(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = mesh_mod.make_mesh(8, axes=("points",))
    S, N = 4, 2048
    world = make_room_cloud(rng, n=N, size=800.0)
    pts = np.zeros((S, N, 3), np.float32)
    msk = np.zeros((S, N), bool)
    for s in range(S):
        pts[s, : len(world)] = world + rng.normal(0, 1.0, world.shape)
        msk[s, : len(world)] = True
    links = np.array([[i, i + 1] for i in range(S - 1)], np.int32)

    from tpu3dtk.ops import nn as nn_ops

    H, cap = 0, 0
    for s in range(S):
        Hs, cs = nn_ops.cell_hash_spec(pts[s], msk[s], 50.0)
        H, cap = max(H, Hs), max(cap, cs)
    Cb, CDb, mb, _ = lum_shard.link_covariances_sharded(
        mesh, pts, msk, links, 2500.0
    )
    Cg, CDg, mg, overflow = lum_shard.link_covariances_sharded(
        mesh, pts, msk, links, 2500.0, n_buckets=H, bucket_cap=cap
    )
    assert not overflow
    np.testing.assert_allclose(mb, mg)
    np.testing.assert_allclose(Cb, Cg, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(CDb, CDg, rtol=1e-4, atol=1e-1)
