"""Extended scan-format coverage: riegl/faro/leica/ks/rts/pts*/xyz*/las
readers (ref src/scanio/scan_io_*.cc — semantics re-expressed, SURVEY §2.2)."""

import numpy as np
import pytest

from tpu3dtk.io import scandir
from tpu3dtk.io.formats import FORMATS, get_format, parse_scan_text
from tpu3dtk.io.las import read_las, write_las


def test_all_reference_ascii_formats_registered():
    # the reference's scanio plugin list (SURVEY §2.2); rxp/e57/velodyne-bin
    # are vendor-SDK/binary formats gated separately
    for name in [
        "uos", "uosr", "uos_rgb", "uos_rgbr", "uos_rrgb", "uos_rrgbt",
        "uos_normal", "uosc", "xyz", "xyzr", "xyz_rgb", "xyz_rgbr",
        "xyz_rrgb", "xyz_rgba", "xyz_normal", "xyzc", "pts", "ptsr",
        "pts_rgb", "pts_rgbr", "pts_rrgb", "riegl_txt", "riegl_rgb",
        "faro_xyz_rgbr", "leica_xyzr", "ks", "ks_rgb", "rts", "las", "laz",
    ]:
        assert name in FORMATS, name


def test_riegl_txt_dir(tmp_path):
    # data: x y z range theta phi refl (RIEGL m frame); header line = count
    pts = np.array([[1.0, 2.0, 3.0, 0, 0, 0, 0.5], [4.0, 5.0, 6.0, 0, 0, 0, 0.25]])
    with open(tmp_path / "scan000.txt", "w") as f:
        f.write("2\n")
        for row in pts:
            f.write(" ".join(str(v) for v in row) + "\n")
    # identity 4x4 (column-major) pose
    np.savetxt(tmp_path / "scan000.dat", np.eye(4).T.reshape(-1)[None])
    scans = list(scandir.read_scan_dir(str(tmp_path), format="riegl_txt"))
    assert len(scans) == 1
    s = scans[0]
    # xyz transform: [x,y,z]m -> [-100y, 100z, 100x]cm
    np.testing.assert_allclose(s.xyz[0], [-200.0, 300.0, 100.0])
    np.testing.assert_allclose(s.channels["reflectance"], [0.5, 0.25])
    # identity RIEGL matrix remaps to a pure axis permutation: translation 0
    np.testing.assert_allclose(s.pose_pos, 0.0, atol=1e-12)


def test_riegl_pose_translation(tmp_path):
    # RIEGL pose with translation (tx,ty,tz) in m at col-major slots 12-14:
    # remap puts 100*[-ty, tz, tx] into uos pos
    m = np.eye(4)
    m[:3, 3] = [1.0, 2.0, 3.0]
    np.savetxt(tmp_path / "p.dat", m.reshape(-1)[None])  # row-major file
    pos, theta = scandir._read_pose_riegl(str(tmp_path / "p.dat"))
    np.testing.assert_allclose(pos, [-200.0, 300.0, 100.0], atol=1e-9)
    np.testing.assert_allclose(theta, 0.0, atol=1e-12)


def test_ks_transform_and_pose(tmp_path):
    with open(tmp_path / "scan000.3d", "w") as f:
        f.write("header\n70001.0 20002.0 3.0\n")
    with open(tmp_path / "scan000.pose", "w") as f:
        f.write("5 6 7\n0 0 0\n")
    scans = list(scandir.read_scan_dir(str(tmp_path), format="ks"))
    s = scans[0]
    # swap y/z, offsets, m->cm: x=(70001-70000)*100, y=3*100, z=(20002-20000)*100
    np.testing.assert_allclose(s.xyz[0], [100.0, 300.0, 200.0])
    # pose: [x,y,z] -> [-z, y, x] * 100
    np.testing.assert_allclose(s.pose_pos, [-700.0, 600.0, 500.0])


def test_rts_invalid_points_dropped():
    spec = get_format("rts")
    raw = np.array(
        [[10.0, 20.0, 30.0, 0, 0, 0], [1.0, 2.0, 3.0, 0x10, 0, 0]]
    )
    ch = parse_scan_text(raw, spec)
    assert len(ch["xyz"]) == 1
    # mm -> cm with axis remap [x,y,z] -> [0.1y, -0.1z, 0.1x]
    np.testing.assert_allclose(ch["xyz"][0], [2.0, -3.0, 1.0])


def test_faro_leica_columns():
    faro = get_format("faro_xyz_rgbr")
    raw = np.array([[9, 9, 1.0, 2.0, 3.0, 10, 20, 30, 0.7]])
    ch = parse_scan_text(raw, faro)
    np.testing.assert_allclose(ch["xyz"][0], [-200.0, 300.0, 100.0])
    assert ch["rgb"].dtype == np.uint8
    leica = get_format("leica_xyzr")
    raw = np.array([[1.0, 2.0, 3.0, 0, 0, 0.9]])
    ch = parse_scan_text(raw, leica)
    np.testing.assert_allclose(ch["reflectance"], [0.9])


def test_las_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-100, 100, size=(500, 3))
    inten = rng.integers(0, 1000, size=500).astype(np.uint16)
    rgb = rng.integers(0, 256, size=(500, 3)).astype(np.uint8)
    path = str(tmp_path / "scan000.las")
    write_las(path, xyz, inten, rgb)
    out = read_las(path)
    np.testing.assert_allclose(out["xyz"], xyz, atol=1e-3)
    np.testing.assert_array_equal(out["reflectance"].astype(np.uint16), inten)
    np.testing.assert_array_equal(out["rgb"], rgb)
    # through the scan-dir reader with the pts-style axis convention
    with open(tmp_path / "scan000.pose", "w") as f:
        f.write("0 0 0\n0 0 0\n")
    scans = list(scandir.read_scan_dir(str(tmp_path), format="las"))
    assert len(scans) == 1
    np.testing.assert_allclose(scans[0].xyz[:, 2], -xyz[:, 2], atol=1e-3)
    # laz spec falls back to .las suffix
    scans2 = list(scandir.read_scan_dir(str(tmp_path), format="laz"))
    assert len(scans2) == 1 and scans2[0].size == 500


def test_las_rejects_laz_payload(tmp_path):
    path = str(tmp_path / "scan000.las")
    write_las(path, np.zeros((1, 3)))
    data = bytearray(open(path, "rb").read())
    data[104] |= 0x80  # compressed-format flag
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="LAZ"):
        read_las(path)
