"""Continuous-time / semi-rigid registration tests: trajectory with
accumulated per-line drift must deform back toward truth."""

import numpy as np
import pytest

from tpu3dtk.core import math3d
from tpu3dtk.models import srr
from tests.conftest import make_room_cloud


def _make_linescans(rng, L=40, drift=0.25, pts_per_line=1500):
    """World cloud seen from L poses along a line; odometry drifts
    linearly (like a miscalibrated mobile platform).  Dense sampling:
    surface spacing must be well below the drift signal for NN matching
    to see it."""
    world = make_room_cloud(rng, n=30000, size=800.0)
    true_poses, meas, odo_poses = [], [], []
    acc = np.zeros(3)
    for i in range(L):
        pos = np.array([5.0 * i, 0.0, 0.0])
        T_true = np.asarray(math3d.euler_to_matrix4(pos, np.zeros(3)))
        true_poses.append(T_true)
        # each line sees a random slice of the world
        sel = rng.choice(len(world), pts_per_line, replace=False)
        local = np.asarray(math3d.transform3(math3d.m4inv(T_true), world[sel]))
        meas.append(local)
        acc = acc + np.array([0.0, 0.0, drift])  # lateral drift
        T_odo = np.asarray(math3d.euler_to_matrix4(pos + acc, np.zeros(3)))
        odo_poses.append(T_odo)
    ls = srr.LineScanSet.from_lists(meas, odo_poses)
    return ls, np.stack(true_poses)


def _err(ls, true_poses):
    return np.mean(np.linalg.norm(ls.poses[:, :3, 3] - true_poses[:, :3, 3], axis=1))


def test_linear_distribute_error(rng):
    ls, true_poses = _make_linescans(rng, L=20)
    # give the last line its true pose; interpolate correction from 0
    before = _err(ls, true_poses)
    srr.linear_distribute_error(ls, 0, 19, true_poses[19])
    np.testing.assert_allclose(ls.poses[19], true_poses[19], atol=1e-9)
    # line 0 untouched (fraction 0)
    assert _err(ls, true_poses) < before


def test_pre_registration_reduces_drift(rng):
    ls, true_poses = _make_linescans(rng, L=40)
    before = _err(ls, true_poses)
    srr.pre_registration(
        ls, first=(0, 6), last=(33, 39),
        max_dist_match2=2500.0, max_iterations=80,
    )
    after = _err(ls, true_poses)
    assert after < before * 0.5, (before, after)


def test_semi_rigid_registration(rng):
    ls, true_poses = _make_linescans(rng, L=30)
    before = _err(ls, true_poses)
    srr.pre_registration(
        ls, first=(0, 6), last=(23, 29),
        max_dist_match2=2500.0, max_iterations=80,
    )
    ret = srr.semi_rigid_registration(
        ls,
        srr.SrrParams(
            scaninterval=5, scansize=4, iterations=2,
            lum_max_dist2=2500.0, odom_weight=5.0,
        ),
    )
    after = _err(ls, true_poses)
    assert after < before * 0.5, (before, after, ret)
    # first line fixed
    np.testing.assert_allclose(ls.poses[0], ls.poses_org[0], atol=1e-12)
