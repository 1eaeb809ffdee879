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


def test_grid_writers_and_lines(tmp_path, rng):
    """gnuplot/world writers + Hough gridlines (ref gridWriter.cc,
    gridlines.cc)."""
    from tpu3dtk.models.grid2d import (
        Grid2DParams, extract_gridlines, make_occupancy_grid,
        write_gnuplot, write_world,
    )

    # an L-shaped wall footprint
    wall1 = np.stack(
        [np.linspace(0, 400, 300), np.zeros(300), np.zeros(300)], axis=1
    )
    wall2 = np.stack(
        [np.zeros(300), np.zeros(300), np.linspace(0, 300, 300)], axis=1
    )
    pts = np.concatenate([wall1, wall2]) + rng.normal(0, 1.0, (600, 3))
    origin = np.array([200.0, 0.0, 150.0])
    g = make_occupancy_grid([pts], [origin], Grid2DParams(resolution=10.0))

    gp = str(tmp_path / "g.dat")
    n = write_gnuplot(g, gp)
    assert n > 20
    rows = np.loadtxt(gp)
    assert rows.shape[1] == 2

    wp = str(tmp_path / "w.dat")
    write_world(g, wp)
    header = open(wp).readline().split()
    assert len(header) == 5 and float(header[4]) == 10.0

    segs = extract_gridlines(g, min_votes=5, min_length=3.0)
    assert len(segs) >= 2
    # the two dominant segments align with the walls (x- and z-axis)
    lengths = [np.linalg.norm(p1 - p0) for p0, p1 in segs]
    best = np.argsort(lengths)[-2:]
    dirs = []
    for b in best:
        p0, p1 = segs[b]
        v = (p1 - p0) / np.linalg.norm(p1 - p0)
        dirs.append(np.abs(v))
    axes_hit = {int(np.argmax(d)) for d in dirs}
    assert axes_hit == {0, 1}, dirs
