"""Multi-device tests on the 8-device virtual CPU mesh: the sharded ICP
must agree with the single-device path (psum partial merge == serial
merge, the Langis property)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dtk.core import math3d
from tpu3dtk.models import icp as icp_mod
from tpu3dtk.parallel import icp_shard, mesh as mesh_mod
from tests.conftest import make_room_cloud


@pytest.fixture(scope="module")
def eight_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.make_mesh(8, axes=("points",))


def _pad(pts, cap):
    out = np.zeros((cap, 3), np.float32)
    out[: len(pts)] = pts
    mask = np.zeros(cap, bool)
    mask[: len(pts)] = True
    return jnp.asarray(out), jnp.asarray(mask)


def test_sharded_icp_matches_single(eight_mesh, rng):
    cloud = make_room_cloud(rng, n=3000)
    T_pert = np.asarray(
        math3d.euler_to_matrix4([6.0, -4.0, 3.0], [0.02, -0.01, 0.015]),
        dtype=np.float32,
    )
    model, mmask = _pad(cloud, 4096)
    target, tmask = _pad(cloud, 4096)  # 4096 divisible by 8

    res_single = icp_mod.icp_pair(
        model, mmask, target, tmask, jnp.asarray(T_pert),
        max_dist_match2=625.0, epsilon=1e-7, max_iterations=60,
    )
    res_shard = icp_shard.icp_pair_sharded(
        eight_mesh, model, mmask, target, tmask, jnp.asarray(T_pert),
        max_dist_match2=625.0, epsilon=1e-7, max_iterations=60,
    )
    np.testing.assert_allclose(
        np.asarray(res_shard.T), np.asarray(res_single.T), atol=5e-3
    )
    np.testing.assert_allclose(np.asarray(res_shard.T), np.eye(4), atol=0.05)
    assert float(res_shard.n_pairs) == pytest.approx(
        float(res_single.n_pairs), rel=0.01
    )


def test_sharded_converges_alone(eight_mesh, rng):
    cloud = make_room_cloud(rng, n=2000)
    model, mmask = _pad(cloud, 2048)
    T_pert = np.asarray(
        math3d.euler_to_matrix4([5.0, 2.0, -3.0], [0.01, 0.02, -0.015]),
        dtype=np.float32,
    )
    res = icp_shard.icp_pair_sharded(
        eight_mesh, model, mmask, model, mmask, jnp.asarray(T_pert),
        max_dist_match2=625.0, epsilon=1e-7, max_iterations=80,
    )
    np.testing.assert_allclose(np.asarray(res.T), np.eye(4), atol=0.05)
