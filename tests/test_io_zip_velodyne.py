"""Zip-archive scan directories (ref testing/scanio/zipreader.cc) and the
velodyne .bin packet decoder (ref src/scanio/scan_io_velodyne.cc)."""

import os
import struct
import zipfile

import numpy as np

from tpu3dtk.io import scandir, velodyne
from tpu3dtk.io.vfs import vexists, vlistdir, vopen


def _write_dat(d, ident, pts, pose=(0, 0, 0, 0, 0, 0)):
    np.savetxt(os.path.join(d, f"scan{ident}.3d"), pts, fmt="%.6f")
    with open(os.path.join(d, f"scan{ident}.pose"), "w") as f:
        f.write(f"{pose[0]} {pose[1]} {pose[2]}\n{pose[3]} {pose[4]} {pose[5]}\n")


def test_zip_scan_dir(tmp_path):
    d = tmp_path / "plain"
    d.mkdir()
    rng = np.random.default_rng(0)
    pts0 = rng.uniform(-100, 100, (50, 3))
    pts1 = rng.uniform(-100, 100, (60, 3))
    _write_dat(str(d), "000", pts0)
    _write_dat(str(d), "001", pts1, pose=(10, 0, 0, 0, 45, 0))
    zpath = tmp_path / "scans.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for fn in os.listdir(d):
            z.write(os.path.join(d, fn), arcname=f"inner/{fn}")

    vdir = str(zpath) + "/inner"
    assert vlistdir(vdir) == sorted(os.listdir(d))
    assert vexists(os.path.join(vdir, "scan000.3d"))
    with vopen(os.path.join(vdir, "scan001.pose")) as f:
        assert b"45" in f.read()

    scans = list(scandir.read_scan_dir(vdir, "uos"))
    assert len(scans) == 2
    np.testing.assert_allclose(scans[0].xyz, pts0, atol=1e-5)
    np.testing.assert_allclose(scans[1].pose_theta[1], np.deg2rad(45.0))
    # identical result to reading the plain directory
    plain = list(scandir.read_scan_dir(str(d), "uos"))
    np.testing.assert_array_equal(scans[1].xyz, plain[1].xyz)


def _make_packet(rot_deg, dists_m, intens):
    """One 100-byte upper-block firing with 32 lasers."""
    b = struct.pack("<HH", 0xEEFF, int(round(rot_deg * 100)))
    for d, i in zip(dists_m, intens):
        b += struct.pack("<HB", int(round(d / velodyne.METERS_PER_LSB)), i)
    return b


def _make_capture(firings):
    """Wrap firings (multiples of 12) into 58-byte-header + 1206-byte blocks."""
    out = b""
    for c in range(0, len(firings), 12):
        block = b"".join(firings[c : c + 12])
        block += b"\x00" * (1206 - len(block))
        out += b"\x00" * velodyne.BLOCK_OFFSET + block
    return out


def test_velodyne_decode_geometry():
    # laser 0 of the default calibration: vert=+2deg, no offsets
    dists = [10.0] + [0.0] * 31  # only laser 0 in range gate (2.2, 120)
    intens = [200] + [0] * 31
    firings = [_make_packet(0.0, dists, intens)] + [
        _make_packet(0.0, [0.0] * 32, [0] * 32)
    ] * 11
    cap = _make_capture(firings)
    out = velodyne.decode_velodyne(cap)
    assert out["xyz"].shape == (1, 3)
    assert out["reflectance"][0] == 200.0
    vert = np.deg2rad(2.0)
    # rotational 0 -> ctheta = 2pi -> clamped to 0 -> theta = 0
    x = 10.0 * np.cos(0.0) * np.cos(vert)
    y = 10.0 * np.sin(0.0) * np.cos(vert)
    z = 10.0 * np.sin(vert)
    expect = np.array([x * 100, z * 100, -y * 100])
    np.testing.assert_allclose(out["xyz"][0], expect, atol=1e-6)


def test_velodyne_gates():
    # distance outside (2.2, 120) m dropped; bad header dropped
    near = _make_packet(90.0, [1.0] * 32, [1] * 32)
    far = _make_packet(90.0, [125.0] * 32, [1] * 32)
    ok = _make_packet(90.0, [50.0] * 32, [7] * 32)
    bad = b"\x00\x00" + ok[2:]
    firings = [near, far, ok, bad] + [_make_packet(0, [0] * 32, [0] * 32)] * 8
    out = velodyne.decode_velodyne(_make_capture(firings))
    assert len(out["xyz"]) == 32  # only the ok firing survives
    assert (out["reflectance"] == 7.0).all()


def test_velodyne_format_registered(tmp_path):
    cap = _make_capture(
        [_make_packet(45.0, [20.0] * 32, [9] * 32)]
        + [_make_packet(0, [0] * 32, [0] * 32)] * 11
    )
    (tmp_path / "scan000.bin").write_bytes(cap)
    (tmp_path / "scan000.pose").write_text("0 0 0\n0 0 0\n")
    scans = list(scandir.read_scan_dir(str(tmp_path), "velodyne"))
    assert len(scans) == 1 and scans[0].size == 32
    assert "reflectance" in scans[0].channels


def test_velodyne_calibration_csv(tmp_path):
    lines = ["vert,rot,dist,voff,hoff,en"]
    for i in range(64):
        lines.append(f"{i * 0.1},0,0,0,0,1")
    (tmp_path / "calibration.txt").write_text("\n".join(lines))
    cal = velodyne.read_calibration_csv(str(tmp_path / "calibration.txt"))
    assert cal.shape == (64, 6)
    np.testing.assert_allclose(cal[10, 0], 1.0)
    assert (cal[:, 5] == 1).all()
