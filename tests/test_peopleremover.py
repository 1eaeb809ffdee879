"""Change-detection tests: a transient blob seen by one scan must be
carved away by the other scan's free-space rays (peopleremover)."""

import numpy as np
import pytest

from tpu3dtk.models.peopleremover import PeopleRemoverParams, remove_dynamic_points


def _wall(rng, n=2000):
    w = rng.uniform(0, 400, (n, 3))
    w[:, 2] = 400.0  # wall at z=400
    return w


def test_person_removed(rng):
    wall = _wall(rng)
    # scan 0: wall + a 'person' blob at z=200 in front of the wall
    person = np.array([200.0, 200.0, 200.0]) + rng.normal(0, 8, (300, 3))
    scan0 = np.concatenate([wall, person])
    # scan 1: same wall, person gone -> its rays pass through the blob
    scan1 = _wall(rng)
    origin = np.array([200.0, 200.0, 0.0])
    masks = remove_dynamic_points(
        [scan0, scan1], [origin, origin],
        PeopleRemoverParams(voxel_size=20.0),
    )
    keep0, keep1 = masks
    # person points removed
    assert keep0[len(wall):].mean() < 0.1
    # wall points kept
    assert keep0[: len(wall)].mean() > 0.9
    assert keep1.mean() > 0.9


def test_static_scene_untouched(rng):
    wall = _wall(rng)
    origin = np.array([200.0, 200.0, 0.0])
    masks = remove_dynamic_points(
        [wall, _wall(rng)], [origin, origin],
        PeopleRemoverParams(voxel_size=20.0),
    )
    assert masks[0].mean() > 0.95
    assert masks[1].mean() > 0.95


def test_maxrange_methods(rng):
    """normals / 1nearest maxrange limiting (ref --maxrange-method):
    both must still remove the transient blob while carving less near
    grazing surfaces (strictly fewer or equal free voxels -> keep-mask
    supersets of the 'none' mode on static points)."""
    from tpu3dtk.models.peopleremover import (
        PeopleRemoverParams, remove_dynamic_points,
    )

    # static wall + a transient blob seen only in scan 0
    wall = np.stack(
        [rng.uniform(0, 400, 2500), rng.uniform(0, 300, 2500),
         np.full(2500, 300.0)], axis=1
    )
    blob = rng.uniform(140, 170, (200, 3))
    blob[:, 2] = rng.uniform(100, 130, 200)
    scan0 = np.concatenate([wall, blob])
    scan1 = wall + rng.normal(0, 0.5, wall.shape)
    origins = [np.array([200.0, 150.0, 0.0]), np.array([210.0, 150.0, 0.0])]

    results = {}
    for mode in ("none", "normals", "1nearest"):
        masks = remove_dynamic_points(
            [scan0, scan1], origins,
            PeopleRemoverParams(voxel_size=10.0, maxrange_method=mode),
        )
        blob_kept = masks[0][len(wall):].mean()
        wall_kept = masks[0][: len(wall)].mean()
        results[mode] = (blob_kept, wall_kept)
        assert blob_kept < 0.2, (mode, blob_kept)   # transient removed
    # the wall is viewed at grazing incidence: plain carving eats into
    # it (the exact pathology the maxrange methods exist for, Schauer &
    # Nüchter); the normals method must rescue it
    assert results["normals"][1] > 0.9, results
    assert results["normals"][1] > results["none"][1] + 0.3, results
    assert results["1nearest"][1] >= results["none"][1]
