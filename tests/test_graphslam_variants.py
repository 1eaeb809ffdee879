"""GraphSLAM alternative parametrizations (-G 2/3/4): quat LUM,
global helix, global small-angle — pose noise on a ring of scans must
shrink under every variant, and perfect poses must stay put."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3dtk.core import math3d
from tpu3dtk.models import graphslam as gs
from tpu3dtk.models import graphslam_variants as gsv
from tests.test_graphslam import _pose_err, _ring_scans


VARIANTS = {
    "quat": gsv.do_graph_slam_quat,
    "helix": gsv.do_graph_slam_helix,
    "apx": gsv.do_graph_slam_apx,
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_variant_reduces_pose_error(rng, name):
    scans, true_poses = _ring_scans(rng)
    before = _pose_err(scans, true_poses)
    links = gs.build_proximity_graph(
        np.stack([s.rPos for s in scans]), cldist2=1e9, loopsize=0
    )
    ret = VARIANTS[name](
        scans,
        links,
        gs.LumParams(max_dist_match2=2500.0, iterations=25, epsilon=0.01),
    )
    after = _pose_err(scans, true_poses)
    assert after < before * 0.5, (name, before, after)
    assert ret < 1.0


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_variant_identity_is_stable(rng, name):
    scans, true_poses = _ring_scans(rng, noise_t=0.0, noise_r=0.0)
    links = gs.build_proximity_graph(
        np.stack([s.rPos for s in scans]), cldist2=1e9, loopsize=0
    )
    VARIANTS[name](
        scans,
        links,
        gs.LumParams(max_dist_match2=2500.0, iterations=3, epsilon=1e-6),
    )
    assert _pose_err(scans, true_poses) < 0.5, name


def test_raw_sums_match_euler_covariance(rng):
    """The shared raw-sum kernel must reproduce the Euler LUM link
    covariance when its moments are recombined (same C up to fp)."""
    from tests.conftest import make_room_cloud

    cloud = make_room_cloud(rng, n=800)
    shifted = cloud + np.array([2.0, 0.0, -1.0], np.float32)
    k = len(cloud)
    pts = np.zeros((2, 1024, 3), np.float32)
    msk = np.zeros((2, 1024), bool)
    pts[0, :k] = cloud
    pts[1, :k] = shifted
    msk[:, :k] = True
    links = np.array([[0, 1]], np.int32)
    raw = gsv.link_raw_sums(
        jnp.asarray(pts), jnp.asarray(msk), jnp.asarray(links),
        jnp.float32(2500.0),
    )
    raw = {kk: np.asarray(v, np.float64) for kk, v in raw.items()}
    # pair count must match the Euler kernel's
    _, _, m = gs.link_covariances(
        jnp.asarray(pts), jnp.asarray(msk), jnp.asarray(links),
        jnp.float32(2500.0),
    )
    assert float(raw["m"][0]) == float(m[0])
    # delta sum = sa − sb ≈ k * (−shift)
    sd = raw["sa"][0] - raw["sb"][0]
    np.testing.assert_allclose(
        sd / raw["m"][0], [-2.0, 0.0, 1.0], atol=0.2
    )


def test_helix_computeRt_identity():
    T = gsv._helix_computeRt(np.zeros(6))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-12)
    # pure translation: c = 0, cs = -t
    T = gsv._helix_computeRt(np.array([0, 0, 0, 1.0, 2.0, 3.0]))
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(T[:3, 3], [-1, -2, -3], atol=1e-12)


def test_pipeline_dispatches_variant(rng):
    from tpu3dtk.models.graph_pipeline import GraphPipeline
    from tpu3dtk.models.icp import IcpParams

    scans, true_poses = _ring_scans(rng, n=4)
    before = _pose_err(scans, true_poses)
    pipe = GraphPipeline(
        icp_params=IcpParams(max_dist_match2=2500.0, max_iterations=10),
        lum_max_dist2=2500.0,
        lum_iterations=10,
        lum_epsilon=0.01,
        slam_algo=2,
        cldist=1e6,
        loopsize=0,
    )
    pipe.run(scans)
    assert _pose_err(scans, true_poses) < max(before, 1.0)
