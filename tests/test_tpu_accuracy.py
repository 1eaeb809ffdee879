"""TPU-backend accuracy tier (VERDICT r3 weak #2/#3).

These tests only run when the suite is pointed at real hardware:

    TPU3DTK_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_accuracy.py -q

Rationale: the forced-CPU default tier cannot see TPU-specific failures
— round 3 shipped a 17 cm dat ATE (bf16 MXU passes mis-ranking NN
candidates) while 208/208 CPU tests were green.  This tier asserts the
kernels and the end-to-end pipeline hold their accuracy contracts on
the chip itself.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

on_tpu = jax.default_backend() == "tpu"
pytestmark = pytest.mark.skipif(
    not on_tpu, reason="TPU backend not active (set TPU3DTK_TEST_PLATFORM=tpu)"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden")


def _exact_nn(query, model):
    """f64 host NN oracle."""
    from scipy.spatial import cKDTree

    d, idx = cKDTree(model.astype(np.float64)).query(query.astype(np.float64))
    return idx, d**2


@pytest.fixture(scope="module")
def clouds(rng=None):
    rng = np.random.default_rng(7)
    M, Q = 8192, 8192
    model = rng.uniform(-800, 800, (M, 3)).astype(np.float32)
    query = (model[rng.permutation(Q) % M] + rng.normal(0, 5, (Q, 3))).astype(
        np.float32
    )
    return model, query


def test_nn_brute_xla_exact_on_tpu(clouds):
    """XLA brute NN must rank exactly on the MXU (HIGHEST precision)."""
    from tpu3dtk.ops import nn as nn_ops

    model, query = clouds
    idx_t, d2_t = _exact_nn(query, model)
    idx, d2, found = nn_ops.nn_brute(
        jnp.asarray(query), jnp.ones(len(query), bool),
        jnp.asarray(model), jnp.ones(len(model), bool), jnp.float32(625.0),
    )
    idx = np.asarray(idx)
    # ties at identical distance are legal; require the chosen d2 to
    # match the true minimum to f32 accuracy
    d2c = ((query - model[idx]) ** 2).sum(1)
    np.testing.assert_allclose(d2c, d2_t, atol=1e-2)
    assert (idx == idx_t).mean() > 0.999


def test_nn_brute_mxu_pallas_on_tpu(clouds):
    """The Pallas MXU kernel (the in-loop production NN) holds both
    ranking contracts: precise=True ranks exactly; the default 3-pass
    split ranking stays within its documented rank-error bound
    (~1.2e-5 · centered-extent², nn_pallas._cross_rank)."""
    from tpu3dtk.ops.nn_pallas import nn_brute_mxu

    model, query = clouds
    idx_t, d2_t = _exact_nn(query, model)
    qj = jnp.asarray(query)
    qm = jnp.ones(len(query), bool)
    mj = jnp.asarray(model)
    mm = jnp.ones(len(model), bool)

    idx, d2, found = nn_brute_mxu(qj, qm, mj, mm, 625.0, precise=True)
    idx = np.asarray(idx)
    d2c = ((query - model[idx]) ** 2).sum(1)
    np.testing.assert_allclose(d2c, d2_t, atol=1e-2)
    assert (idx == idx_t).mean() > 0.999

    idx, d2, found = nn_brute_mxu(qj, qm, mj, mm, 625.0)
    idx = np.asarray(idx)
    d2c = ((query - model[idx]) ** 2).sum(1)
    ext = np.abs(model - model.mean(0)).max()
    bound = 2.0 * 1.2e-5 * ext * ext  # 2x headroom on the split bound
    assert (d2c - d2_t).max() < bound
    assert (idx == idx_t).mean() > 0.998


def test_cell_hash_exact_on_tpu(clouds):
    """Standalone hashed cell-list query matches the oracle within
    radius on the chip."""
    from tpu3dtk.ops import nn as nn_ops

    model, query = clouds
    idx_t, d2_t = _exact_nn(query, model)
    max_dist = 25.0
    H, cap = nn_ops.cell_hash_spec(model, np.ones(len(model), bool), max_dist)
    grid = nn_ops.build_cell_hash(
        jnp.asarray(model), jnp.ones(len(model), bool),
        jnp.asarray(model.min(0)), jnp.float32(max_dist), H,
    )
    idx, d2, found = nn_ops.nn_cell_hash(
        jnp.asarray(query), jnp.ones(len(query), bool), grid,
        jnp.float32(max_dist**2), cap,
    )
    found = np.asarray(found)
    d2 = np.asarray(d2)
    in_range = d2_t < max_dist**2
    assert (found == in_range).all()
    np.testing.assert_allclose(d2[found], d2_t[found], atol=1e-2)


def test_ate_dat_on_tpu(dat_dir, tmp_path):
    """End-to-end dat pipeline accuracy ON THE CHIP — the gate round 3
    failed invisibly (17.14 cm with default matmul precision; 0.013 cm
    with exact-f32 ranking)."""
    if not os.path.isdir(os.path.join(GOLDEN, "dat")):
        pytest.skip("golden dat missing")
    from test_ate import run_dat_pipeline

    from tpu3dtk.io.converters import ate

    out = str(tmp_path / "frames")
    run_dat_pipeline(dat_dir, out)
    res = ate(out, os.path.join(GOLDEN, "dat"), align=False)
    assert res["rmse"] < 5.0, res
    assert res["max"] < 8.0, res
