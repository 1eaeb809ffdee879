"""CLI + converter tests: tpuslam end-to-end on a tiny synthetic dir,
scan_red, exportPoints, converters round trips, ATE."""

import os

import numpy as np
import pytest

from tpu3dtk.core import math3d
from tpu3dtk.io import converters as cv, frames as frames_io, writer
from tests.conftest import make_room_cloud


@pytest.fixture
def scan_dir(tmp_path, rng):
    """Write a 2-scan uos directory with known offset."""
    world = make_room_cloud(rng, n=2000, size=600.0)
    d = tmp_path / "scans"
    d.mkdir()
    for k in range(2):
        T = np.asarray(math3d.euler_to_matrix4([10.0 * k, 0, 0], np.zeros(3)))
        local = np.asarray(math3d.transform3(math3d.m4inv(T), world))
        writer.write_uos(str(d / f"scan{k:03d}.3d"), local)
        # odometry slightly off for scan 1
        offs = np.array([10.0 * k + (2.0 if k else 0.0), 0, 0])
        writer.write_pose(str(d / f"scan{k:03d}.pose"), offs, np.zeros(3))
    return str(d)


def test_tpuslam_cli(scan_dir, tmp_path):
    from tpu3dtk.cli.slam6d import main

    out = str(tmp_path / "frames")
    os.makedirs(out, exist_ok=True)
    rc = main(
        [scan_dir, "-r", "15", "-O", "1", "-d", "30", "-i", "50",
         "--epsICP", "1e-6", "--frames-out", out, "-q"]
    )
    assert rc == 0
    mats, types = frames_io.read_frames(os.path.join(out, "scan001.frames"))
    # final pose ~ [10, 0, 0] (odometry error 2cm corrected)
    np.testing.assert_allclose(mats[-1][:3, 3], [10.0, 0, 0], atol=1.0)


def test_scan_red_cli(scan_dir):
    from tpu3dtk.cli.scan_red import main

    rc = main([scan_dir, "-v", "30", "--octree", "0"])
    assert rc == 0
    red = np.loadtxt(os.path.join(scan_dir, "reduced", "scan000.3d"))
    assert 10 < len(red) < 2000


def test_export_cli(scan_dir, tmp_path):
    from tpu3dtk.cli.export_points import main

    out = str(tmp_path / "out.pts")
    rc = main([scan_dir, "--use-pose", "-o", out])
    assert rc == 0
    pts = np.loadtxt(out)
    assert len(pts) == 2 * 1998


def test_converters_roundtrip(tmp_path, rng):
    d = tmp_path / "fr"
    d.mkdir()
    poses = []
    for k in range(4):
        T = np.asarray(
            math3d.euler_to_matrix4(rng.uniform(-100, 100, 3), rng.uniform(-0.5, 0.5, 3))
        )
        poses.append(T)
        frames_io.write_frames(
            str(d / f"scan{k:03d}.frames"), T[None], [frames_io.AlgoType.ICP]
        )
    # frames2pose -> pose2frames round trip
    n = cv.frames_to_pose(str(d))
    assert n == 4
    d2 = tmp_path / "fr2"
    d2.mkdir()
    cv.pose_to_frames(str(d), str(d2))
    for k in range(4):
        T2 = frames_io.final_pose(str(d2 / f"scan{k:03d}.frames"))
        np.testing.assert_allclose(T2, poses[k], atol=1e-9)
    # kitti round trip
    kf = str(tmp_path / "traj.kitti")
    cv.frames_to_kitti(str(d), kf)
    kd = tmp_path / "kposes"
    cv.kitti_to_poses(kf, str(kd))
    from tpu3dtk.io.scandir import read_pose_file

    for k in range(4):
        pos, theta = read_pose_file(str(kd / f"scan{k:03d}.pose"))
        T2 = np.asarray(math3d.euler_to_matrix4(pos, theta))
        np.testing.assert_allclose(T2, poses[k], atol=1e-6)
    # tum + length + ate
    cv.frames_to_tum(str(d), str(tmp_path / "t.tum"))
    assert cv.trajectory_length(str(d)) > 0
    res = cv.ate(str(d), str(d), align=False)
    assert res["rmse"] == 0.0


def test_ate_detects_offset(tmp_path):
    da, db = tmp_path / "a", tmp_path / "b"
    da.mkdir()
    db.mkdir()
    for k in range(3):
        T = np.eye(4)
        T[:3, 3] = [k * 100.0, 0, 0]
        frames_io.write_frames(str(da / f"scan{k}.frames"), T[None], [1])
        T2 = T.copy()
        T2[1, 3] += 5.0  # constant offset -> removed by alignment
        frames_io.write_frames(str(db / f"scan{k}.frames"), T2[None], [1])
    assert cv.ate(str(da), str(db), align=False)["rmse"] == pytest.approx(5.0)
    assert cv.ate(str(da), str(db), align=True)["rmse"] < 1e-9


def test_custom_filter_modes():
    """CheckerCustom DSL (ref pointfilter.cc:296-420)."""
    from tpu3dtk.io.scandir import PointFilter, custom_filter_mask

    pts = np.array([
        [0.0, 0.0, 0.0],      # origin
        [50.0, 0.0, 0.0],     # inside small cuboid
        [500.0, 0.0, 0.0],    # outside
    ])
    # mode 0: keep inside symmetric cuboid 100^3 -> removes the far point
    rm = custom_filter_mask(pts, "0;3;100;100;100")
    assert list(rm) == [False, False, True]
    # mode 10: keep outside -> removes the near points
    rm = custom_filter_mask(pts, "10;3;100;100;100")
    assert list(rm) == [True, True, False]
    # mode 21: sphere keep-inside around origin r=60
    rm = custom_filter_mask(pts, "21;4;0;0;0;60")
    assert list(rm) == [False, False, True]
    # chain: anything fired removes
    rm = custom_filter_mask(pts, "21;4;0;0;0;60/10;3;100;100;100")
    assert list(rm) == [True, True, True]
    # through PointFilter.apply (keep = ~removed)
    pf = PointFilter(custom="0;3;100;100;100")
    assert list(pf.apply(pts)) == [True, True, False]


def test_range_set_dsl():
    """scan_settings range parser semantics."""
    from tpu3dtk.io.scandir import expand_range_set, parse_range_set

    assert parse_range_set("3") == [(3, 3, 1)]
    assert parse_range_set("1:5") == [(1, 5, 1)]
    assert parse_range_set("0:2:8") == [(0, 8, 2)]
    assert parse_range_set("4:$") == [(4, -1, 1)]
    avail = list(range(10))
    assert expand_range_set("1:3,7", avail) == [1, 2, 3, 7]
    assert expand_range_set("0:2:8", avail) == [0, 2, 4, 6, 8]
    assert expand_range_set("6:$", avail) == [6, 7, 8, 9]
