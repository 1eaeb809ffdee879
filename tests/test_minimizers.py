"""Minimizer unit tests — the numeric regression suite the reference
lacks (SURVEY §4): known rigid transforms must be recovered exactly from
synthetic pairs by every closed-form minimizer."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3dtk.core import math3d
from tpu3dtk.models import minimizers as mz


def _make_pairs(rng, n=500, angle=0.3, trans=50.0):
    d = rng.uniform(-100, 100, (n, 3)).astype(np.float32)
    theta = rng.uniform(-angle, angle, 3)
    t = rng.uniform(-trans, trans, 3)
    T = np.asarray(math3d.euler_to_matrix4(t, theta), dtype=np.float32)
    m = np.asarray(math3d.transform3(T, d), dtype=np.float32)
    return m, d, T


@pytest.mark.parametrize("name", ["quat", "svd", "ortho", "dual"])
def test_exact_recovery(name, rng):
    m, d, T_true = _make_pairs(rng)
    w = np.ones(len(m), np.float32)
    stats = mz.pair_stats(jnp.asarray(m), jnp.asarray(d), jnp.asarray(w))
    T, err = mz.MINIMIZERS[name](stats)
    np.testing.assert_allclose(np.asarray(T), T_true, atol=2e-3)
    # residual after applying T is ~0
    res = np.asarray(math3d.transform3(np.asarray(T), d)) - m
    assert np.abs(res).max() < 0.1


def test_apx_small_angle(rng):
    m, d, T_true = _make_pairs(rng, angle=0.02, trans=5.0)
    stats = mz.pair_stats(jnp.asarray(m), jnp.asarray(d), jnp.ones(len(m), jnp.float32))
    T, err = mz.align_apx(stats)
    res = np.asarray(math3d.transform3(np.asarray(T), d)) - m
    assert np.abs(res).max() < 0.5


def test_weighted_subset(rng):
    """Zero-weight pairs must not affect the solution."""
    m, d, T_true = _make_pairs(rng, n=200)
    # append garbage pairs with weight 0
    m2 = np.concatenate([m, rng.uniform(-1000, 1000, (50, 3)).astype(np.float32)])
    d2 = np.concatenate([d, rng.uniform(-1000, 1000, (50, 3)).astype(np.float32)])
    w = np.concatenate([np.ones(200), np.zeros(50)]).astype(np.float32)
    stats = mz.pair_stats(jnp.asarray(m2), jnp.asarray(d2), jnp.asarray(w))
    T, _ = mz.align_quat(stats)
    np.testing.assert_allclose(np.asarray(T), T_true, atol=2e-3)


def test_merge_stats_equals_global(rng):
    """Langis partial merge == direct global stats (icp6Dminimizer.h:61-82)."""
    m, d, _ = _make_pairs(rng, n=512)
    w = (rng.uniform(size=512) > 0.3).astype(np.float32)
    full = mz.pair_stats(jnp.asarray(m), jnp.asarray(d), jnp.asarray(w))
    import jax
    parts = [
        mz.pair_stats(jnp.asarray(m[i : i + 128]), jnp.asarray(d[i : i + 128]), jnp.asarray(w[i : i + 128]))
        for i in range(0, 512, 128)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *parts)
    merged = mz.merge_stats(stacked)
    np.testing.assert_allclose(float(merged.n), float(full.n))
    np.testing.assert_allclose(np.asarray(merged.S), np.asarray(full.S), rtol=1e-3, atol=1e-1)
    np.testing.assert_allclose(np.asarray(merged.centroid_m), np.asarray(full.centroid_m), rtol=1e-5)


@pytest.mark.parametrize("name", ["helix", "lumeuler"])
def test_small_motion_recovery(name, rng):
    """Linearized minimizers: recover small transforms approximately."""
    m, d, T_true = _make_pairs(rng, angle=0.02, trans=3.0)
    stats = mz.pair_stats(
        jnp.asarray(m), jnp.asarray(d), jnp.ones(len(m), jnp.float32)
    )
    if name == "lumeuler":
        T, _ = mz.align_lumeuler(stats, jnp.eye(4, dtype=jnp.float32))
    else:
        T, _ = mz.MINIMIZERS[name](stats)
    res = np.asarray(math3d.transform3(np.asarray(T), d)) - m
    assert np.abs(res).max() < 1.0, np.abs(res).max()


def test_quatscale_recovers_scale(rng):
    d = rng.uniform(-100, 100, (400, 3)).astype(np.float32)
    s_true = 1.25
    theta = rng.uniform(-0.2, 0.2, 3)
    t = rng.uniform(-20, 20, 3)
    T = np.asarray(math3d.euler_to_matrix4(t, theta), dtype=np.float32)
    m = (np.asarray(math3d.transform3(T, d * s_true))).astype(np.float32)
    stats = mz.pair_stats(
        jnp.asarray(m), jnp.asarray(d), jnp.ones(len(m), jnp.float32)
    )
    Ts, _ = mz.align_quat_scale(stats)
    scale = float(np.linalg.norm(np.asarray(Ts)[:3, 0]))
    np.testing.assert_allclose(scale, s_true, rtol=1e-3)
    res = np.asarray(math3d.transform3(np.asarray(Ts), d)) - m
    assert np.abs(res).max() < 0.5


def test_error_is_rms(rng):
    m, d, _ = _make_pairs(rng, n=100, angle=0.0, trans=0.0)
    d_noisy = d + 1.0  # unit offset in each axis => dist sqrt(3)
    stats = mz.pair_stats(jnp.asarray(m), jnp.asarray(d_noisy), jnp.ones(100, jnp.float32))
    _, err = mz.align_quat(stats)
    np.testing.assert_allclose(float(err), np.sqrt(3.0), rtol=1e-4)


# ---------------------------------------------------------------------------
# Round 2: real ortho / lumquat / napx (previously aliased)
# ---------------------------------------------------------------------------


def _make_pairs_r2(rng, n=400, theta=(0.05, -0.08, 0.03), pos=(2.0, -1.5, 0.7)):
    import jax.numpy as jnp
    import numpy as np

    from tpu3dtk.core import math3d
    from tpu3dtk.models import minimizers as mz

    d = rng.uniform(-100, 100, (n, 3)).astype(np.float32)
    Tt = np.asarray(math3d.euler_to_matrix4(np.asarray(pos), np.asarray(theta)))
    m = (Tt[:3, :3] @ d.T).T + Tt[:3, 3]
    stats = mz.pair_stats(jnp.asarray(m), jnp.asarray(d), jnp.ones(n))
    return Tt, m, d, stats


def test_ortho_recovers_exact(rng):
    import numpy as np

    from tpu3dtk.models import minimizers as mz

    Tt, m, d, stats = _make_pairs_r2(rng)
    T, err = mz.align_ortho(stats)
    np.testing.assert_allclose(np.asarray(T), Tt, atol=5e-6)
    # distinct implementation from SVD, same optimum
    Tsvd, _ = mz.align_svd(stats)
    np.testing.assert_allclose(np.asarray(T), np.asarray(Tsvd), atol=5e-6)
    assert mz.MINIMIZERS["ortho"] is mz.align_ortho


def test_lumquat_first_order(rng):
    """7-dof quaternion linearization: first-order accurate for small
    motion and converges when iterated (as in ICP)."""
    import jax.numpy as jnp
    import numpy as np

    from tpu3dtk.core import math3d
    from tpu3dtk.models import minimizers as mz

    Tt, m, d, stats = _make_pairs_r2(rng)
    T, err = mz.align_lumquat(stats, jnp.eye(4))
    assert np.abs(np.asarray(T) - Tt).max() < 0.08
    assert mz.MINIMIZERS["lumquat"] is mz.align_lumquat
    # iterate: apply, re-pair, solve again -> converges
    Tc = np.asarray(T, np.float64)
    for _ in range(12):
        dd = (Tc[:3, :3] @ np.asarray(d, np.float64).T).T + Tc[:3, 3]
        stats_i = mz.pair_stats(
            jnp.asarray(m), jnp.asarray(dd.astype(np.float32)), jnp.ones(len(m))
        )
        Ti, _ = mz.align_lumquat(stats_i, jnp.asarray(Tc.astype(np.float32)))
        Tc = np.asarray(Ti, np.float64) @ Tc
    assert np.abs(Tc - Tt).max() < 2e-3


def test_napx_point_to_plane(rng):
    """napx solves the linearized point-to-plane system; with normals it
    converges to the true pose when iterated."""
    import jax.numpy as jnp
    import numpy as np

    from tpu3dtk.models import minimizers as mz

    Tt, m, d, _ = _make_pairs_r2(rng, theta=(0.02, -0.015, 0.01), pos=(1.0, 0.5, -0.8))
    nrm = rng.normal(size=(len(m), 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    Tc = np.eye(4)
    for _ in range(15):
        dd = (Tc[:3, :3] @ d.astype(np.float64).T).T + Tc[:3, 3]
        ns = mz.napx_stats(
            jnp.asarray(m), jnp.asarray(dd.astype(np.float32)),
            jnp.asarray(nrm.astype(np.float32)), jnp.ones(len(m)),
        )
        Ti, _ = mz.align_napx(ns)
        Tc = np.asarray(Ti, np.float64) @ Tc
    assert np.abs(Tc - Tt).max() < 5e-3
    assert mz.MINIMIZERS["napx"] is mz.align_napx
