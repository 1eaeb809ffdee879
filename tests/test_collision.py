"""Collision detection tests."""

import numpy as np

from tpu3dtk.core import math3d
from tpu3dtk.models.collision import CollisionParams, detect_collisions


def test_trajectory_collision(rng):
    # environment: wall at x=100
    env = np.stack(
        [np.full(2000, 100.0), rng.uniform(-200, 200, 2000), rng.uniform(-200, 200, 2000)],
        axis=1,
    )
    # model: small cube at origin
    model = rng.uniform(-5, 5, (200, 3))
    # trajectory moves along +x: poses at x = 0, 50, 93, 120
    poses = np.stack(
        [np.asarray(math3d.euler_to_matrix4([x, 0, 0], np.zeros(3))) for x in (0.0, 50.0, 93.0, 100.0)]
    )
    colliding, hits = detect_collisions(env, model, poses, CollisionParams(radius=10.0))
    assert not colliding[0] and not colliding[1]
    assert colliding[2]  # model surface within 10cm of wall
    assert colliding[3]  # cube straddles the wall
    assert hits[3] > hits[2] >= 1


def test_sweep_collisions(rng):
    """Swept-segment collision via the kd segment search counterpart."""
    from tpu3dtk.models.collision import sweep_collisions

    env = rng.uniform(0, 100, (2000, 3))
    traj = np.array([[0, 50, 50], [100, 50, 50]], np.float64)
    mask, n = sweep_collisions(env, traj, radius=10.0)
    d = np.sqrt(((env[:, 1:] - 50.0) ** 2).sum(1))  # distance to the line
    np.testing.assert_array_equal(mask, d < 10.0)
    assert n == int((d < 10.0).sum())
