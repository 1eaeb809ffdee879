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
