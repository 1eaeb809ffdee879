"""Pallas cell-list NN kernel tests (interpret mode on CPU; the same
code path compiles via Mosaic on TPU)."""

import numpy as np
import pytest

from tpu3dtk.ops import nn_pallas


def _np_nn(q, m):
    d2 = ((q[:, None, :] - m[None]) ** 2).sum(-1)
    idx = d2.argmin(1)
    return idx, d2[np.arange(len(q)), idx]


def test_cell_list_matches_numpy(rng):
    M = 3000
    m = rng.uniform(0, 800, (M, 3)).astype(np.float32)
    q = (m + rng.normal(0, 5, (M, 3))).astype(np.float32)
    mask = np.ones(M, bool)
    idx, d2, found = nn_pallas.nn_cell_list(m, mask, q, mask, 625.0)
    ridx, rd2 = _np_nn(q, m)
    rfound = rd2 < 625.0
    # the 3-pass split ranking may swap near-equidistant candidates
    # (rank bound ~1.2e-5 * extent^2, see nn_pallas._cross_rank); the
    # chosen distance must never beat the true minimum and must stay
    # within the bound of it
    assert (np.asarray(found) == rfound).mean() > 0.999
    b = rfound & np.asarray(found)
    agree = (np.asarray(idx)[b] == ridx[b]).mean()
    assert agree > 0.999  # near-ties may differ
    gap = np.asarray(d2)[b] - rd2[b]
    assert gap.min() > -1e-2
    assert gap.max() < 2.0 * 1.2e-5 * 800.0**2


def test_cell_list_masked_and_sparse(rng):
    M = 1000
    m = rng.uniform(0, 2000, (M, 3)).astype(np.float32)
    q = rng.uniform(0, 2000, (300, 3)).astype(np.float32)
    mmask = rng.uniform(size=M) > 0.3
    qmask = np.ones(300, bool)
    idx, d2, found = nn_pallas.nn_cell_list(m, mmask, q, qmask, 2500.0)
    mv = m.copy()
    mv[~mmask] = 1e9
    ridx, rd2 = _np_nn(q, mv)
    rfound = rd2 < 2500.0
    np.testing.assert_array_equal(np.asarray(found), rfound)
    b = rfound
    np.testing.assert_array_equal(np.asarray(idx)[b], ridx[b])


def test_cell_list_boundary_exclusion():
    m = np.asarray([[10.0, 0.0, 0.0]], np.float32)
    q = np.asarray([[0.0, 0.0, 0.0]], np.float32)
    one = np.ones(1, bool)
    _, _, found = nn_pallas.nn_cell_list(m, one, q, one, 100.0)
    assert not bool(found[0])
    _, _, found = nn_pallas.nn_cell_list(m, one, q, one, 100.01)
    assert bool(found[0])


def test_cell_list_chained_matches_brute(rng):
    """The chained cell-list engine (plan -> kernel -> post jits) must
    agree with brute NN wherever its guards stay green."""
    import jax
    import jax.numpy as jnp

    from tpu3dtk.ops import nn as nn_ops
    from tpu3dtk.ops import nn_pallas as npl

    M, Q = 6000, 2000
    model = rng.uniform(0, 500, (M, 3)).astype(np.float32)
    query = (model[rng.permutation(Q) % M] + rng.normal(0, 3, (Q, 3))).astype(
        np.float32
    )
    max_dist = 25.0
    spec = npl.cell_list_spec(model, max_dist, queries=[query])
    assert spec is not None
    build = jax.jit(
        npl.build_cell_list_model, static_argnames=("dims", "RB")
    )
    clm, oob_m = build(
        jnp.asarray(model), jnp.ones(M, bool),
        jnp.asarray(spec["origin"]), jnp.float32(max_dist),
        dims=spec["dims"], RB=spec["RB"],
    )
    assert int(oob_m) == 0
    idx, d2, found, ovf, oob = npl.nn_cell_list_chained(
        jnp.asarray(query), jnp.ones(Q, bool), clm,
        jnp.float32(max_dist**2),
        dims=spec["dims"], RB=spec["RB"], chunk=spec["chunk"],
    )
    assert not bool(ovf) and int(oob) == 0
    bi, bd, bf = nn_ops.nn_brute(
        jnp.asarray(query), jnp.ones(Q, bool),
        jnp.asarray(model), jnp.ones(M, bool), jnp.float32(max_dist**2),
    )
    np.testing.assert_array_equal(np.asarray(found), np.asarray(bf))
    sel = np.asarray(found)
    np.testing.assert_allclose(
        np.asarray(d2)[sel], np.asarray(bd)[sel], atol=1e-2
    )


def test_icp_pair_chained_matches_brute(rng):
    """Full chained ICP vs the while_loop brute ICP on one pair."""
    import jax.numpy as jnp

    from tpu3dtk.core import math3d
    from tpu3dtk.models import icp as icp_mod
    from tests.conftest import make_room_cloud

    world = rng.uniform(0, 400, (5000, 3)).astype(np.float32)
    T_true = np.asarray(
        math3d.euler_to_matrix4([6.0, -4.0, 5.0], [0.01, -0.02, 0.015])
    )
    target = np.asarray(
        math3d.transform3(math3d.m4inv(T_true), world)
    ).astype(np.float32)
    mmask = jnp.ones(len(world), bool)
    tmask = jnp.ones(len(target), bool)
    res_c = icp_mod.icp_pair_chained(
        jnp.asarray(world), mmask, jnp.asarray(target), tmask,
        jnp.eye(4, dtype=jnp.float32),
        max_dist_match2=625.0, epsilon=1e-7, max_iterations=40,
    )
    assert int(res_c.maxocc) == 0  # guards stayed green
    T_c = np.asarray(res_c.T, np.float64)
    np.testing.assert_allclose(T_c, T_true, atol=0.5)
