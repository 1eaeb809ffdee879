"""FH segmentation tests (segmentation module)."""

import numpy as np

from tpu3dtk.models.segmentation import FHParams, fh_segmentation


def test_two_clusters(rng):
    a = rng.normal(0, 5, (300, 3))
    b = rng.normal(0, 5, (300, 3)) + np.array([200.0, 0, 0])
    pts = np.concatenate([a, b])
    labels = fh_segmentation(pts, FHParams(k=6, threshold=100.0, min_size=10))
    assert len(np.unique(labels)) == 2
    # clusters internally consistent
    assert len(np.unique(labels[:300])) == 1
    assert len(np.unique(labels[300:])) == 1
    assert labels[0] != labels[300]


def test_min_size_merges(rng):
    a = rng.normal(0, 5, (200, 3))
    outlier = np.array([[50.0, 0, 0]])
    pts = np.concatenate([a, outlier])
    labels = fh_segmentation(pts, FHParams(k=5, threshold=10.0, min_size=5))
    # the singleton outlier is absorbed
    counts = np.bincount(labels)
    assert counts.min() >= 5


def test_region_growing_two_planes(rng):
    """RG segmentation separates two perpendicular planes that touch
    (where FH would need careful thresholds)."""
    from tpu3dtk.models.segmentation import region_growing_segmentation

    n = 1200
    a = np.stack(
        [rng.uniform(0, 200, n), rng.uniform(0, 200, n), np.zeros(n)], 1
    )
    b = np.stack(
        [rng.uniform(0, 200, n), np.zeros(n), rng.uniform(1.0, 200, n)], 1
    )
    pts = np.concatenate([a, b])
    na = np.tile([0.0, 0.0, 1.0], (n, 1))
    nb = np.tile([0.0, 1.0, 0.0], (n, 1))
    labels = region_growing_segmentation(
        pts, np.concatenate([na, nb]), k=8, dist_thresh=30.0
    )
    la = labels[:n]
    lb = labels[n:]
    # each plane is one dominant component, and they differ
    da = np.bincount(la[la >= 0]).argmax()
    db = np.bincount(lb[lb >= 0]).argmax()
    assert da != db
    assert (la == da).mean() > 0.9
    assert (lb == db).mean() > 0.9


def test_graph_cut_segmentation_two_walls(rng):
    """Graph-cut plane segmentation (ref src/segmentation/graph_cut/):
    a scene of two perpendicular walls around the origin segments into
    (at least) two large planar segments with consistent labels."""
    from tpu3dtk.models.segmentation import (
        GraphCutParams, graph_cut_segmentation,
    )

    n = 4000
    # wall A: x = +300 plane; wall B: z = +300 plane (scanner at origin)
    a = np.stack([
        np.full(n, 300.0),
        rng.uniform(-200, 200, n),
        rng.uniform(-280, 280, n),
    ], axis=1)
    b = np.stack([
        rng.uniform(-280, 280, n),
        rng.uniform(-200, 200, n),
        np.full(n, 300.0),
    ], axis=1)
    pts = np.concatenate([a, b]) + rng.normal(0, 0.5, (2 * n, 3))
    labels = graph_cut_segmentation(
        pts, GraphCutParams(width=180, height=90, min_points=30, tau=2.0)
    )
    assert labels.shape == (2 * n,)
    la = labels[:n]
    lb = labels[n:]
    # each wall is dominated by one segment, and they differ
    ma = np.bincount(la[la >= 0]).argmax()
    mb = np.bincount(lb[lb >= 0]).argmax()
    assert ma != mb
    assert (la == ma).mean() > 0.5
    assert (lb == mb).mean() > 0.5
