"""Multi-object tracking tests (veloslam core)."""

import numpy as np

from tpu3dtk.models.tracking import MultiObjectTracker, TrackerParams


def test_kalman_tracks_moving_object(rng):
    tracker = MultiObjectTracker(TrackerParams(min_motion=30.0))
    # static object at (0,0,0), moving object advancing 20cm/frame in x
    for k in range(8):
        meas = np.array([[0.0, 0.0, 0.0], [20.0 * k, 0.0, 100.0]])
        tracker.step(meas)
    assert len(tracker.tracks) == 2
    dyn = tracker.dynamic_tracks()
    assert len(dyn) == 1
    assert abs(dyn[0].pos[0] - 140.0) < 10.0
    # velocity estimate ~20 cm/frame
    assert abs(dyn[0].x[3] - 20.0) < 8.0


def test_track_retirement(rng):
    tracker = MultiObjectTracker(TrackerParams(max_misses=2))
    tracker.step(np.array([[0.0, 0, 0]]))
    for _ in range(4):
        tracker.step(np.zeros((0, 3)))
    assert len(tracker.tracks) == 0


def test_cluster_and_track_frames(rng):
    tracker = MultiObjectTracker(
        TrackerParams(cluster_threshold=60.0, cluster_min_size=10, min_motion=40.0)
    )
    for k in range(6):
        static_blob = rng.normal(0, 5, (60, 3)) + np.array([300.0, 0, 0])
        moving_blob = rng.normal(0, 5, (60, 3)) + np.array([0.0, 0, 25.0 * k])
        tracker.process_frame(np.concatenate([static_blob, moving_blob]))
    assert len(tracker.tracks) == 2
    dyn = tracker.dynamic_tracks()
    assert len(dyn) == 1
    assert dyn[0].bbox is not None
