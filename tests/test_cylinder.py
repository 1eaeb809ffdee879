"""Cylinder detection tests (detectCylinder role)."""

import numpy as np

from tpu3dtk.models.cylinder import CylinderParams, detect_cylinders


def _cylinder_cloud(rng, axis, center, radius, height, n=3000, noise=0.3):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    u = np.linalg.svd(np.eye(3) - np.outer(axis, axis))[0][:, :2]
    phi = rng.uniform(0, 2 * np.pi, n)
    h = rng.uniform(-height / 2, height / 2, n)
    ring = (radius + rng.normal(0, noise, n))[:, None] * (
        np.cos(phi)[:, None] * u[:, 0] + np.sin(phi)[:, None] * u[:, 1]
    )
    return np.asarray(center) + ring + h[:, None] * axis


def test_single_cylinder(rng):
    pts = _cylinder_cloud(rng, [0, 1, 0], [100.0, 0, 50.0], radius=30.0, height=200.0)
    cyls = detect_cylinders(pts, params=CylinderParams(min_inliers=500))
    assert len(cyls) >= 1
    c = cyls[0]
    assert abs(abs(c.axis @ np.array([0, 1, 0])) - 1.0) < 0.05
    assert abs(c.radius - 30.0) < 3.0
    # center on the axis: xz close to (100, 50)
    assert np.linalg.norm(c.center[[0, 2]] - [100.0, 50.0]) < 5.0


def test_tilted_cylinder(rng):
    ax = np.array([1.0, 2.0, 0.5])
    pts = _cylinder_cloud(rng, ax, [0.0, 0, 0], radius=20.0, height=150.0)
    cyls = detect_cylinders(pts, params=CylinderParams(min_inliers=400))
    assert len(cyls) >= 1
    axn = ax / np.linalg.norm(ax)
    assert abs(abs(cyls[0].axis @ axn) - 1.0) < 0.05
    assert abs(cyls[0].radius - 20.0) < 3.0
