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
