"""2D occupancy grid tests (grid module / 2DGridder role)."""

import numpy as np

from tpu3dtk.models.grid2d import Grid2DParams, make_occupancy_grid


def test_wall_and_free_space(rng):
    # wall at z=300 seen from origin: cells at the wall occupied,
    # cells along the rays free
    wall = np.stack(
        [rng.uniform(-100, 100, 3000), rng.normal(0, 5, 3000), np.full(3000, 300.0)],
        axis=1,
    )
    origin = np.zeros(3)
    g = make_occupancy_grid([wall], [origin], Grid2DParams(resolution=20.0))
    occ = g.occupancy
    # wall row: occupied
    wall_j = int((300.0 - g.origin[1]) / g.resolution)
    mid_i = int((0.0 - g.origin[0]) / g.resolution)
    assert occ[mid_i, wall_j] > 0.5
    # halfway along the ray: free (visited, no hits)
    half_j = int((150.0 - g.origin[1]) / g.resolution)
    assert 0.0 <= occ[mid_i, half_j] < 0.2
    # behind the wall: unknown
    # (row beyond wall within grid bounds may not exist; check unknown cells exist)
    assert (occ == -1.0).any()


def test_height_band_filter(rng):
    pts = np.stack(
        [rng.uniform(0, 100, 1000), rng.uniform(-50, 250, 1000), rng.uniform(0, 100, 1000)],
        axis=1,
    )
    g = make_occupancy_grid(
        [pts], [np.zeros(3)],
        Grid2DParams(resolution=10.0, y_min=0.0, y_max=100.0, count_free=False),
    )
    # roughly 1/3 of points in band
    assert 200 < g.hits.sum() < 500


def test_pgm_output(tmp_path, rng):
    pts = np.stack(
        [rng.uniform(0, 100, 500), np.zeros(500), rng.uniform(0, 100, 500)], axis=1
    )
    g = make_occupancy_grid([pts], [np.zeros(3)], Grid2DParams(resolution=10.0))
    p = tmp_path / "map.pgm"
    g.write_pgm(str(p))
    data = p.read_bytes()
    assert data.startswith(b"P5\n")
