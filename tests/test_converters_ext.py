"""Converter tools added in round 2: average6DoFposes, transformFrames,
multFrames, frames2riegl/riegl2frames round-trip, scan_diff,
condense/atomize (ref src/slam6d/*.cc, SURVEY §2.1 converters row)."""

import os

import numpy as np
import pytest

from tpu3dtk.core import math3d
from tpu3dtk.io import condense as cond_mod
from tpu3dtk.io import converters as cv
from tpu3dtk.io import frames as frames_io
from tpu3dtk.io.scandir import read_scan_dir


def _rand_pose(rng):
    pos = rng.uniform(-100, 100, 3)
    theta = rng.uniform(-np.pi, np.pi, 3)
    return np.asarray(math3d.euler_to_matrix4(pos, theta))


def test_average_pose_matrices_identity_cluster():
    rng = np.random.default_rng(1)
    base = _rand_pose(rng)
    mats = []
    for _ in range(20):
        d = np.asarray(
            math3d.euler_to_matrix4(rng.normal(0, 0.01, 3), rng.normal(0, 1e-3, 3))
        )
        mats.append(base @ d)
    avg = cv.average_pose_matrices(mats)
    R = avg[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(R) > 0.999
    np.testing.assert_allclose(avg, base, atol=0.05)


def test_transform_frames(tmp_path):
    rng = np.random.default_rng(2)
    T0 = _rand_pose(rng)
    frames_io.write_frames(str(tmp_path / "scan000.frames"), T0[None], [2])
    G = _rand_pose(rng)
    cv.transform_frames(str(tmp_path), G)
    out = frames_io.final_pose(str(tmp_path / "scan000.frames"))
    np.testing.assert_allclose(out, G @ T0, atol=1e-9)


def test_mult_frames_reanchors(tmp_path):
    rng = np.random.default_rng(3)
    poses = [_rand_pose(rng) for _ in range(3)]
    for i, T in enumerate(poses):
        frames_io.write_frames(str(tmp_path / f"scan{i:03d}.frames"), T[None], [2])
    G = _rand_pose(rng)  # anchor's true global pose
    out = tmp_path / "out"
    n = cv.mult_frames(str(tmp_path), G, str(out), anchor=0)
    assert n == 3
    # anchor lands exactly on G; relative poses preserved
    A = frames_io.final_pose(str(out / "scan000.frames"))
    np.testing.assert_allclose(A, G, atol=1e-9)
    for i in (1, 2):
        B = frames_io.final_pose(str(out / f"scan{i:03d}.frames"))
        rel_new = np.asarray(math3d.m4inv(A)) @ B
        rel_old = np.asarray(math3d.m4inv(poses[0])) @ poses[i]
        np.testing.assert_allclose(rel_new, rel_old, atol=1e-9)


def test_riegl_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    T = _rand_pose(rng)
    frames_io.write_frames(str(tmp_path / "scan000.frames"), T[None], [2])
    cv.frames_to_riegl(str(tmp_path))
    os.remove(tmp_path / "scan000.frames")
    cv.riegl_to_frames(str(tmp_path))
    back = frames_io.final_pose(str(tmp_path / "scan000.frames"))
    np.testing.assert_allclose(back, T, atol=1e-6)


def _write_seq(d, n_scans, rng, npts=300):
    base = rng.uniform(-200, 200, (npts, 3))
    for i in range(n_scans):
        pose = np.array([30.0 * i, 0, 0, 0, 0, 0])
        np.savetxt(os.path.join(d, f"scan{i:03d}.3d"), base, fmt="%.4f")
        with open(os.path.join(d, f"scan{i:03d}.pose"), "w") as f:
            f.write(f"{pose[0]} {pose[1]} {pose[2]}\n{pose[3]} {pose[4]} {pose[5]}\n")
    return base


def test_condense_atomize_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    d = str(tmp_path)
    _write_seq(d, 6, rng, npts=100)
    n = cond_mod.condense(d, "uos", split=3)
    assert n == 2
    cond_dir = os.path.join(d, "cond")
    scans = list(read_scan_dir(cond_dir, "uos"))
    assert len(scans) == 2 and scans[0].size == 300
    # condensed pose = anchor pose of each group
    np.testing.assert_allclose(scans[1].pose_pos, [90.0, 0, 0], atol=1e-6)

    # pretend SLAM shifted each condensed scan by +5cm in x
    for i, s in enumerate(scans):
        T = np.asarray(math3d.euler_to_matrix4(s.pose_pos, s.pose_theta))
        T[0, 3] += 5.0
        frames_io.write_frames(
            os.path.join(cond_dir, f"scan{i:03d}.frames"), T[None], [2]
        )
    n = cond_mod.atomize(cond_dir, d, "uos", split=3)
    assert n == 6
    for i in range(6):
        T = frames_io.final_pose(os.path.join(d, f"scan{i:03d}.frames"))
        np.testing.assert_allclose(T[0, 3], 30.0 * i + 5.0, atol=1e-9)


def test_scan_diff(tmp_path):
    rng = np.random.default_rng(6)
    d = str(tmp_path)
    a = rng.uniform(-100, 100, (500, 3))
    extra = np.array([[1000.0, 1000.0, 1000.0], [1200.0, 0.0, 0.0]])
    b = np.concatenate([a + rng.normal(0, 0.1, a.shape), extra])
    np.savetxt(os.path.join(d, "scan000.3d"), a, fmt="%.4f")
    np.savetxt(os.path.join(d, "scan001.3d"), b, fmt="%.4f")
    for i in range(2):
        with open(os.path.join(d, f"scan{i:03d}.pose"), "w") as f:
            f.write("0 0 0\n0 0 0\n")
    diff = cv.scan_diff(d, "uos", 0, 1, max_dist=10.0)
    assert len(diff) == 2
    np.testing.assert_allclose(sorted(diff[:, 0]), [1000.0, 1200.0], atol=0.01)
