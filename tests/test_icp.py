"""ICP engine tests: synthetic perturbed clouds must register back."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3dtk.core import math3d
from tpu3dtk.models import icp
from tests.conftest import make_room_cloud


def _pad(pts, cap):
    out = np.zeros((cap, 3), np.float32)
    out[: len(pts)] = pts
    mask = np.zeros(cap, bool)
    mask[: len(pts)] = True
    return jnp.asarray(out), jnp.asarray(mask)


def test_icp_recovers_perturbation(rng):
    model_np = make_room_cloud(rng, n=3000)
    # target: same cloud, ground-truth pose identity, start from a
    # perturbed initial pose
    theta = np.array([0.02, -0.03, 0.015])
    t = np.array([8.0, -5.0, 6.0])
    T_pert = np.asarray(math3d.euler_to_matrix4(t, theta), dtype=np.float32)
    model, mmask = _pad(model_np, 3072)
    target, tmask = _pad(model_np, 3072)

    res = icp.icp_pair(
        model,
        mmask,
        target,
        tmask,
        jnp.asarray(T_pert),
        max_dist_match2=625.0,
        epsilon=1e-7,
        max_iterations=100,
        minimizer="quat",
    )
    T = np.asarray(res.T)
    np.testing.assert_allclose(T, np.eye(4), atol=0.05)
    assert float(res.error) < 0.5
    assert int(res.iterations) > 1


@pytest.mark.parametrize("minimizer", ["svd", "apx"])
def test_icp_other_minimizers(minimizer, rng):
    model_np = make_room_cloud(rng, n=2000)
    T_pert = np.asarray(
        math3d.euler_to_matrix4([5.0, 3.0, -4.0], [0.015, 0.02, -0.01]),
        dtype=np.float32,
    )
    model, mmask = _pad(model_np, 2048)
    res = icp.icp_pair(
        model, mmask, model, mmask, jnp.asarray(T_pert),
        max_dist_match2=625.0, epsilon=1e-7, max_iterations=100,
        minimizer=minimizer,
    )
    np.testing.assert_allclose(np.asarray(res.T), np.eye(4), atol=0.08)


def test_icp_no_pairs_is_identity(rng):
    """If everything is out of range the pose must not move."""
    model_np = make_room_cloud(rng, n=500)
    far = model_np + 10000.0
    model, mmask = _pad(model_np, 512)
    target, tmask = _pad(far, 512)
    T0 = jnp.eye(4, dtype=jnp.float32)
    res = icp.icp_pair(
        model, mmask, target, tmask, T0,
        max_dist_match2=100.0, epsilon=1e-6, max_iterations=10,
    )
    np.testing.assert_allclose(np.asarray(res.T), np.eye(4), atol=1e-6)


def test_icp_step_reduces_error(rng):
    model_np = make_room_cloud(rng, n=2000)
    T_pert = np.asarray(
        math3d.euler_to_matrix4([5.0, 0, 0], [0, 0.02, 0]), dtype=np.float32
    )
    model, mmask = _pad(model_np, 2048)
    T1, err1, n1 = icp.icp_step(model, mmask, model, mmask, jnp.asarray(T_pert), 2500.0)
    T2, err2, n2 = icp.icp_step(model, mmask, model, mmask, T1, 2500.0)
    assert float(err2) < float(err1)


def test_icp_pair_grid_matches_brute(rng):
    """The hashed-cell-list hot loop registers to the same pose as the
    brute-force path (the reference's kd-tree vs CUDA-grid duality,
    src/cuda/grid_kernel.cu:314-420)."""
    import jax.numpy as jnp
    import numpy as np

    from tests.conftest import make_room_cloud
    from tpu3dtk.core import math3d
    from tpu3dtk.models import icp as icp_mod
    from tpu3dtk.ops import nn as nn_ops

    model = make_room_cloud(rng, n=9000, size=900.0).astype(np.float32)
    Tt = np.asarray(
        math3d.euler_to_matrix4(
            np.array([6.0, -4.0, 2.0]), np.array([0.015, -0.02, 0.01])
        )
    )
    Ti = np.asarray(math3d.m4inv(Tt))
    target = ((Ti[:3, :3] @ model.T).T + Ti[:3, 3]).astype(np.float32)
    mm = np.ones(len(model), bool)
    tm = np.ones(len(target), bool)
    H, cap = nn_ops.cell_hash_spec(model, mm, 25.0)
    common = dict(max_dist_match2=625.0, epsilon=1e-7, max_iterations=50)
    a = jnp.asarray
    rb = icp_mod.icp_pair(
        a(model), a(mm), a(target), a(tm), jnp.eye(4, dtype=jnp.float32),
        **common,
    )
    rg = icp_mod.icp_pair(
        a(model), a(mm), a(target), a(tm), jnp.eye(4, dtype=jnp.float32),
        grid_buckets=H, grid_bucket_cap=cap, **common,
    )
    Tb, Tg = np.asarray(rb.T), np.asarray(rg.T)
    assert np.abs(Tb - Tt).max() < 5e-3
    assert np.abs(Tg - Tt).max() < 5e-3
    np.testing.assert_allclose(Tg, Tb, atol=1e-3)
