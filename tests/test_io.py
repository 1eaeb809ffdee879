"""I/O tests, mirroring the reference's scanio integration tests
(testing/scanio/readscans.cc:12-30: 3 scans x 81360 points, first-point
values to high precision)."""

import os

import numpy as np
import pytest

from tpu3dtk.io import formats, frames, scandir, writer


def test_read_dat_directory(dat_dir):
    scans = list(scandir.read_scan_dir(dat_dir, format="uos"))
    assert len(scans) == 3
    assert [s.identifier for s in scans] == ["000", "001", "002"]
    for s in scans:
        assert s.size == 81360
    # first point of scan000 (ref testing/scanio/readscans.cc asserts
    # first-point values; dat/scan000.3d line 1 = "10.1 0 0")
    np.testing.assert_allclose(scans[0].xyz[0], [10.1, 0.0, 0.0], atol=1e-13)
    # scan000.pose is all zeros
    np.testing.assert_allclose(scans[0].pose_pos, 0.0)
    np.testing.assert_allclose(scans[0].pose_theta, 0.0)


def test_range_filter(dat_dir):
    pf = scandir.PointFilter(range_max=500.0)
    scans = list(scandir.read_scan_dir(dat_dir, format="uos", start=0, end=0, point_filter=pf))
    s = scans[0]
    assert s.size < 81360
    d = np.linalg.norm(s.xyz, axis=1)
    assert d.max() <= 500.0


def test_start_end_selection(dat_dir):
    scans = list(scandir.read_scan_dir(dat_dir, format="uos", start=1, end=2))
    assert [s.identifier for s in scans] == ["001", "002"]


def test_xyz_format_transform(tmp_path):
    # xyz format: metres right-handed -> cm uos left-handed (helper.cc:63-72)
    p = tmp_path / "scan000.xyz"
    p.write_text("1.0 2.0 3.0\n")
    (tmp_path / "scan000.pose").write_text("0 0 0\n0 0 0\n")
    spec = formats.get_format("xyz")
    spec = formats.FormatSpec("xyz", spec.columns, spec.transform, data_suffix=".xyz")
    s = scandir.read_scan(str(tmp_path), "000", spec)
    np.testing.assert_allclose(s.xyz[0], [-200.0, 300.0, 100.0])


def test_uosr_channels(tmp_path):
    (tmp_path / "scan000.3d").write_text("1 2 3 0.5\n4 5 6 0.25\n")
    (tmp_path / "scan000.pose").write_text("1 2 3\n10 20 30\n")
    s = scandir.read_scan(str(tmp_path), "000", formats.get_format("uosr"))
    np.testing.assert_allclose(s.channels["reflectance"], [0.5, 0.25])
    np.testing.assert_allclose(s.pose_pos, [1, 2, 3])
    np.testing.assert_allclose(s.pose_theta, np.deg2rad([10, 20, 30]))


def test_frames_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    mats = rng.normal(size=(4, 4, 4))
    mats[:, 3, :] = [0, 0, 0, 1]
    types = [frames.AlgoType.INVALID, frames.AlgoType.ICP, frames.AlgoType.LUM, frames.AlgoType.ICP]
    path = str(tmp_path / "scan000.frames")
    frames.write_frames(path, mats, types)
    m2, t2 = frames.read_frames(path)
    np.testing.assert_allclose(m2, mats, atol=0)
    np.testing.assert_array_equal(t2, [0, 1, 3, 1])
    np.testing.assert_allclose(frames.final_pose(path), mats[-1])


def test_write_uos_and_pose(tmp_path):
    pts = np.array([[1.5, 2.5, 3.5], [4, 5, 6]])
    writer.write_uos(str(tmp_path / "o.3d"), pts)
    back = np.loadtxt(tmp_path / "o.3d")
    np.testing.assert_allclose(back, pts)
    writer.write_pose(str(tmp_path / "o.pose"), [1, 2, 3], np.deg2rad([10, 20, 30]))
    vals = np.loadtxt(tmp_path / "o.pose")
    np.testing.assert_allclose(vals, [[1, 2, 3], [10, 20, 30]], atol=1e-12)
