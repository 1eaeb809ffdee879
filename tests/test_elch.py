"""ELCH loop-closure tests: graph_balancer weight distribution and
end-to-end drift correction on a synthetic loop."""

import numpy as np
import pytest

from tpu3dtk.core import math3d
from tpu3dtk.core.scan import TPUScan
from tpu3dtk.models import elch
from tests.conftest import make_room_cloud


def test_graph_balancer_chain():
    """Simple chain 0-1-2-3 closing 0..3: weights interpolate 0 -> 1 by
    path distance."""
    edges = [(0, 1), (1, 2), (2, 3)]
    w = elch.graph_balancer(edges, [1.0, 1.0, 1.0], 0, 3, 4)
    np.testing.assert_allclose(w, [0.0, 1 / 3, 2 / 3, 1.0], atol=1e-12)


def test_graph_balancer_weighted_chain():
    edges = [(0, 1), (1, 2), (2, 3)]
    w = elch.graph_balancer(edges, [1.0, 2.0, 1.0], 0, 3, 4)
    np.testing.assert_allclose(w, [0.0, 0.25, 0.75, 1.0], atol=1e-12)


def test_graph_balancer_branch():
    """A dangling branch inherits its junction's weight."""
    edges = [(0, 1), (1, 2), (2, 3), (1, 4)]
    w = elch.graph_balancer(edges, [1.0] * 4, 0, 3, 5)
    np.testing.assert_allclose(w[:4], [0.0, 1 / 3, 2 / 3, 1.0], atol=1e-12)
    np.testing.assert_allclose(w[4], w[1])


def _loop_scans(rng, n=8, drift_per_step=2.0):
    """Ring of scans with accumulated odometry drift: last scan revisits
    the first's location but odometry has drifted."""
    world = make_room_cloud(rng, n=3000, size=800.0)
    scans = []
    true_poses = []
    drift = np.zeros(3)
    for k in range(n):
        ang = 2 * np.pi * k / n
        pos = np.array([200 * np.cos(ang), 0.0, 200 * np.sin(ang)])
        T_true = np.asarray(math3d.euler_to_matrix4(pos, np.zeros(3)))
        true_poses.append(T_true)
        local = np.asarray(math3d.transform3(math3d.m4inv(T_true), world))
        if k > 0:
            drift = drift + np.array([drift_per_step, 0.0, drift_per_step * 0.5])
        T0 = np.asarray(math3d.euler_to_matrix4(pos + drift, np.zeros(3)))
        s = TPUScan.from_points(local, f"{k:03d}", pose=T0)
        s.set_reduction(15.0, 1)
        scans.append(s)
    return scans, true_poses


def test_close_loop_reduces_drift(rng):
    scans, true_poses = _loop_scans(rng)
    n = len(scans)
    edges = [(i, i + 1) for i in range(n - 1)]
    before = np.mean(
        [
            np.linalg.norm(s.transMat[:3, 3] - T[:3, 3])
            for s, T in zip(scans, true_poses)
        ]
    )
    elch.close_loop(
        scans, 0, n - 1, edges,
        elch.ElchParams(max_dist_match2=2500.0, icp_iterations=80),
    )
    after = np.mean(
        [
            np.linalg.norm(s.transMat[:3, 3] - T[:3, 3])
            for s, T in zip(scans, true_poses)
        ]
    )
    assert after < before, (before, after)
    # scan 0 untouched
    np.testing.assert_allclose(scans[0].transMat, true_poses[0], atol=1e-9)


def test_pipeline_with_loop(rng):
    """Full pipeline: ICP + loop detection + ELCH + LUM on a drifting
    ring; final poses much closer to truth than raw odometry."""
    from tpu3dtk.models.graph_pipeline import GraphPipeline
    from tpu3dtk.models.icp import IcpParams

    scans, true_poses = _loop_scans(rng, n=8, drift_per_step=1.5)
    odo_err = np.mean(
        [
            np.linalg.norm(s.transMatOrg[:3, 3] - T[:3, 3])
            for s, T in zip(scans, true_poses)
        ]
    )
    pipe = GraphPipeline(
        icp_params=IcpParams(max_dist_match2=2500.0, max_iterations=40, epsilon=1e-6),
        elch=True,
        cldist=120.0,
        loopsize=4,
        lum_max_dist2=2500.0,
        lum_iterations=10,
        lum_epsilon=0.05,
    )
    pipe.run(scans)
    final_err = np.mean(
        [
            np.linalg.norm(s.transMat[:3, 3] - T[:3, 3])
            for s, T in zip(scans, true_poses)
        ]
    )
    assert final_err < odo_err * 0.5, (odo_err, final_err)


@pytest.mark.parametrize("algo", [1, 2, 3])
def test_close_loop_variants_reduce_drift(rng, algo):
    """The euler (-L 1), quat (-L 2) and unitQuat (-L 3) distributions
    must each pull the drifted ring towards truth, like slerp does."""
    scans, true_poses = _loop_scans(rng)
    n = len(scans)
    edges = [(i, i + 1) for i in range(n - 1)]
    before = np.mean(
        [
            np.linalg.norm(s.transMat[:3, 3] - T[:3, 3])
            for s, T in zip(scans, true_poses)
        ]
    )
    elch.ELCH_VARIANTS[algo](
        scans, 0, n - 1, edges,
        elch.ElchParams(max_dist_match2=2500.0, icp_iterations=80),
    )
    after = np.mean(
        [
            np.linalg.norm(s.transMat[:3, 3] - T[:3, 3])
            for s, T in zip(scans, true_poses)
        ]
    )
    assert after < before * 0.7, (algo, before, after)
    np.testing.assert_allclose(scans[0].transMat, true_poses[0], atol=1e-9)
    # every scan got an ELCH frame
    assert all(s.frames for s in scans)


def test_close_loop_device_points_matches_legacy(rng):
    """The pinned resident-tensor ELCH path (GraphPipeline's shape-
    stable fast path) must produce the same poses as the legacy
    host-padded path."""
    import jax.numpy as jnp

    from tpu3dtk.models import graphslam as gs

    scans_a, _ = _loop_scans(rng)
    rng2 = np.random.default_rng(42)
    scans_b, _ = _loop_scans(rng2)
    n = len(scans_a)
    edges = [(i, i + 1) for i in range(n - 1)]

    elch.close_loop(scans_a, 0, n - 1, edges, elch.ElchParams())

    cap = max(len(s.reduced_local()) for s in scans_b)
    cap = ((cap + 511) // 512) * 512
    locals_pad, masks = gs._pad_scan_points(scans_b, cap)
    params = elch.ElchParams(
        scan_cap=n,
        device_points=(jnp.asarray(locals_pad), jnp.asarray(masks)),
    )
    elch.close_loop(scans_b, 0, n - 1, edges, params)

    for sa, sb in zip(scans_a, scans_b):
        np.testing.assert_allclose(sa.transMat, sb.transMat, atol=1e-3)
