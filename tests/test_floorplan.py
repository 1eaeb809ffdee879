"""Floorplan extraction tests."""

import numpy as np

from tpu3dtk.models.floorplan import FloorplanParams, extract_floorplan


def test_square_room_walls(rng):
    # four walls of a 600x600 room at wall height
    pts = []
    n = 4000
    for axis, off in [(0, 0.0), (0, 600.0), (2, 0.0), (2, 600.0)]:
        w = np.zeros((n, 3))
        w[:, 0 if axis == 2 else 2] = rng.uniform(0, 600, n)
        w[:, axis] = off + rng.normal(0, 2.0, n)
        w[:, 1] = rng.uniform(60, 180, n)
        pts.append(w)
    cloud = np.concatenate(pts)
    segs = extract_floorplan(
        [cloud], [np.array([300.0, 100.0, 300.0])],
        FloorplanParams(resolution=10.0, min_votes=15, min_length=200.0),
    )
    assert len(segs) >= 4
    # the longest segments are ~600cm and axis-aligned
    lengths = sorted(s.length for s in segs)
    assert lengths[-1] > 400.0
    dirs = []
    for s in segs:
        d = s.p1 - s.p0
        d = d / (np.linalg.norm(d) + 1e-9)
        dirs.append(np.abs(d))
    dirs = np.asarray(dirs)
    axis_aligned = (dirs.max(1) > 0.97).mean()
    assert axis_aligned > 0.7
