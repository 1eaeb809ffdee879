"""subgraphicp + sc_fixed/icpFixpoint counterparts (ref
src/slam6d/subgraphicp.cc, graphSlam6D.cc:136 computeGraph6Dautomatic,
src/sc_fixed/, src/slam6d/icpFixpoint.cc)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3dtk.core import math3d
from tpu3dtk.core.scan import TPUScan
from tpu3dtk.models import graphslam as gs
from tpu3dtk.models.sc_fixed import compare_fixed_float, icp_pair_fixed
from tpu3dtk.models.subgraph import SubgraphParams, subgraph_slam
from tests.conftest import make_room_cloud


def _loop_scans(rng, n=8, jitter=3.0):
    world = make_room_cloud(rng, n=3000, size=800.0)
    scans = []
    for k in range(n):
        pos = np.array([60.0 * k, 0.0, 0.0])
        T_true = np.asarray(math3d.euler_to_matrix4(pos, np.zeros(3)))
        local = np.asarray(math3d.transform3(math3d.m4inv(T_true), world))
        d = rng.normal(0, jitter, 3) if k else np.zeros(3)
        T0 = np.asarray(math3d.euler_to_matrix4(pos + d, np.zeros(3)))
        s = TPUScan.from_points(local, f"{k:03d}", pose=T0)
        s.set_reduction(20.0, 1)
        scans.append(s)
    return scans, world


def test_build_clpairs_graph(rng):
    scans, _ = _loop_scans(rng, n=6, jitter=0.0)
    links = gs.build_clpairs_graph(scans, 625.0, min_pairs=100)
    pairs = {tuple(l) for l in links}
    # all scans see the same room -> every overlapping pair links
    assert (0, 1) in pairs and (4, 5) in pairs
    assert len(links) >= 5
    # an impossible pair threshold removes everything
    links2 = gs.build_clpairs_graph(scans, 625.0, min_pairs=10**9)
    assert len(links2) == 0


def test_subgraph_slam_reduces_drift(rng):
    scans, world = _loop_scans(rng, n=8, jitter=4.0)

    def err(ss):
        e = 0.0
        for k, s in enumerate(ss):
            true = np.array([60.0 * k, 0.0, 0.0])
            e += np.linalg.norm(s.transMat[:3, 3] - true)
        return e / len(ss)

    e0 = err(scans)
    info = subgraph_slam(
        scans,
        SubgraphParams(
            size=4, clpairs=50, max_dist_match2=625.0,
            lum_max_dist2=625.0, lum_iterations=15, iterations=15,
        ),
    )
    assert info["chunks"] == 2
    assert all(c > 0 for c in info["chunk_links"])
    e1 = err(scans)
    assert e1 < 0.6 * e0, (e0, e1, info)


def test_icp_pair_fixed_converges(rng):
    world = make_room_cloud(rng, n=4000, size=600.0)
    T_true = np.asarray(
        math3d.euler_to_matrix4([6.0, -4.0, 3.0], [0.01, 0.02, -0.015])
    )
    target = np.asarray(math3d.transform3(math3d.m4inv(T_true), world))
    res = icp_pair_fixed(
        jnp.asarray(world, jnp.float32), jnp.ones(len(world), bool),
        jnp.asarray(target, jnp.float32), jnp.ones(len(target), bool),
        jnp.eye(4, dtype=jnp.float32), 625.0,
        max_iterations=60, eps_exp=5,
    )
    T = np.asarray(res.T, np.float64)
    # the quantized path must land within bf16-resolution of truth:
    # coords ~±300 cm ⇒ bf16 quantization ~1-2 cm
    assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 3.0
    assert int(res.iterations) > 0


def test_compare_fixed_float(rng):
    world = make_room_cloud(rng, n=3000, size=500.0)
    T_true = np.asarray(math3d.euler_to_matrix4([4.0, 2.0, -3.0], [0, 0, 0]))
    target = np.asarray(math3d.transform3(math3d.m4inv(T_true), world))
    out = compare_fixed_float(
        world.astype(np.float32), target.astype(np.float32),
        np.eye(4, dtype=np.float32), 625.0, max_iterations=50,
    )
    # quantized and exact pipelines agree to a few cm on this scale
    assert out["delta_translation_cm"] < 5.0, out
