"""ASTM E57 reader/writer (io/e57.py — the reference reads E57 through
3rdparty/e57 + src/slam6d/e572scan.cc)."""

import numpy as np

from tpu3dtk.io import e57 as e57_io


def test_e57_roundtrip(tmp_path, rng):
    pts = rng.uniform(-5, 5, (3001, 3))
    inten = rng.uniform(0, 1, 3001)
    t = np.array([1.0, 2.0, 3.0])
    q = np.array([0.9238795, 0.0, 0.3826834, 0.0])
    path = str(tmp_path / "scan000.e57")
    e57_io.write_e57(path, pts, translation=t, quaternion=q, intensity=inten)
    ch = e57_io.read_e57(path)
    np.testing.assert_allclose(ch["xyz"], pts, atol=0)
    np.testing.assert_allclose(ch["reflectance"], inten, atol=0)
    np.testing.assert_allclose(ch["pose_translation"], t)
    np.testing.assert_allclose(ch["pose_quaternion"], q)


def test_e57_multi_packet(tmp_path, rng):
    """More points than fit one 64 KiB data packet."""
    pts = rng.uniform(-50, 50, (20000, 3))
    path = str(tmp_path / "big.e57")
    e57_io.write_e57(path, pts)
    ch = e57_io.read_e57(path)
    np.testing.assert_allclose(ch["xyz"], pts, atol=0)


def test_e57_crc_pages(tmp_path, rng):
    """Every physical page carries a valid CRC-32C of its payload."""
    pts = rng.uniform(-1, 1, (500, 3))
    path = str(tmp_path / "c.e57")
    e57_io.write_e57(path, pts)
    raw = open(path, "rb").read()
    assert len(raw) % 1024 == 0
    for a in range(0, len(raw), 1024):
        page = raw[a: a + 1024]
        crc = int.from_bytes(page[1020:], "little")
        assert crc == e57_io._crc32c(page[:1020])


def test_e57_bitpack_decoder():
    """Odd-width LSB-first bit-packed integers decode exactly."""
    rng = np.random.default_rng(5)
    for width in (1, 3, 10, 17, 24, 33):
        vals = rng.integers(0, 2**width, 257, dtype=np.uint64)
        bits = np.zeros(len(vals) * width, np.uint8)
        for i, v in enumerate(vals):
            for b in range(width):
                bits[i * width + b] = (int(v) >> b) & 1
        buf = np.packbits(bits, bitorder="little").tobytes()
        out = e57_io._decode_bitpack(buf, width, len(vals))
        np.testing.assert_array_equal(out, vals)


def test_e57_format_registered(tmp_path, rng):
    """read_scan_dir pulls e57 files through the format registry with
    the metres-right-handed -> uos-cm transform."""
    from tpu3dtk.io.scandir import read_scan_dir

    pts = rng.uniform(-2, 2, (800, 3))
    e57_io.write_e57(str(tmp_path / "scan000.e57"), pts)
    (tmp_path / "scan000.pose").write_text("0 0 0\n0 0 0\n")
    scans = list(read_scan_dir(str(tmp_path), format="e57"))
    assert len(scans) == 1
    xyz = scans[0].channels["xyz"]
    np.testing.assert_allclose(xyz[:, 2], 100.0 * pts[:, 0], atol=1e-9)
    np.testing.assert_allclose(xyz[:, 0], -100.0 * pts[:, 1], atol=1e-9)


def test_e572scan_converter(tmp_path, rng):
    pts = rng.uniform(-2, 2, (300, 3))
    path = str(tmp_path / "city.e57")
    e57_io.write_e57(path, pts, translation=[1.0, 0.0, 2.0])
    out = tmp_path / "scans"
    n = e57_io.e57_to_scan(path, str(out))
    assert n == 1
    data = np.loadtxt(out / "scan000.3d")
    assert data.shape == (300, 3)
    pose = np.loadtxt(out / "scan000.pose")
    np.testing.assert_allclose(pose[0], [-0.0, 200.0, 100.0])
