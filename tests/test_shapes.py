"""Hough plane detection tests (shapes module, bin/planes role)."""

import numpy as np
import pytest

from tpu3dtk.models import shapes


def test_single_plane(rng):
    pts = rng.uniform(0, 500, (2000, 3))
    pts[:, 1] = 100.0 + rng.normal(0, 0.5, 2000)
    planes = shapes.detect_planes(
        pts, shapes.HoughParams(min_inliers=200, dist_tol=5.0, rho_max=1000.0)
    )
    assert len(planes) >= 1
    p = planes[0]
    assert abs(abs(p.normal[1]) - 1.0) < 0.02
    assert abs(abs(p.rho) - 100.0) < 5.0
    assert p.n_inliers > 1500


def test_three_walls(rng):
    walls = []
    for axis, off in [(0, 0.0), (1, 0.0), (2, 300.0)]:
        w = rng.uniform(0, 300, (1500, 3))
        w[:, axis] = off + rng.normal(0, 0.3, 1500)
        walls.append(w)
    pts = np.concatenate(walls)
    planes = shapes.detect_planes(
        pts, shapes.HoughParams(min_inliers=400, dist_tol=5.0, rho_max=600.0)
    )
    assert len(planes) == 3
    normals = np.stack([np.abs(p.normal) for p in planes])
    # each wall axis represented
    assert sorted(np.argmax(normals, axis=1).tolist()) == [0, 1, 2]


def test_noise_only_no_planes(rng):
    pts = rng.uniform(0, 500, (1000, 3))
    planes = shapes.detect_planes(
        pts, shapes.HoughParams(min_inliers=400, dist_tol=3.0, rho_max=1000.0)
    )
    assert len(planes) == 0


def test_detect_planes_rht(rng):
    """Randomized Hough (ref Hough::RHT) finds the room's walls."""
    from tests.conftest import make_room_cloud
    from tpu3dtk.models.shapes import HoughParams, detect_planes_rht

    pts = make_room_cloud(rng, n=6000, size=700.0)
    planes = detect_planes_rht(
        pts,
        HoughParams(min_inliers=400, max_planes=8, dist_tol=8.0),
        seed=3,
    )
    assert len(planes) >= 4
    # every detected normal is an axis
    for p in planes:
        assert np.abs(p.normal).max() > 0.98, p.normal
