"""PLY reader + config system tests."""

import dataclasses
import struct

import numpy as np
import pytest

from tpu3dtk.io.ply import read_ply
from tpu3dtk.utils.config import apply_config, load_kv_file, parse_scan_ranges


def test_ply_ascii(tmp_path):
    p = tmp_path / "a.ply"
    p.write_text(
        "ply\nformat ascii 1.0\ncomment test\n"
        "element vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
        "1 2 3 255 0 0\n4 5 6 0 255 0\n"
    )
    ch = read_ply(str(p))
    np.testing.assert_allclose(ch["xyz"], [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_array_equal(ch["rgb"], [[255, 0, 0], [0, 255, 0]])


def test_ply_binary(tmp_path):
    p = tmp_path / "b.ply"
    header = (
        b"ply\nformat binary_little_endian 1.0\n"
        b"element vertex 2\n"
        b"property float x\nproperty float y\nproperty float z\n"
        b"property float intensity\n"
        b"end_header\n"
    )
    body = struct.pack("<4f", 1, 2, 3, 0.5) + struct.pack("<4f", 4, 5, 6, 0.25)
    p.write_bytes(header + body)
    ch = read_ply(str(p))
    np.testing.assert_allclose(ch["xyz"], [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_allclose(ch["reflectance"], [0.5, 0.25])


def test_kv_config(tmp_path):
    p = tmp_path / "hough.cfg"
    p.write_text(
        "# comment\nMaxDist 500.0\nMinSizeAllPoints 42\nUseRansac true\n"
        "voxel_size = 12.5\n"
    )
    kv = load_kv_file(str(p))
    assert kv["maxdist"] == "500.0"

    @dataclasses.dataclass
    class C:
        max_dist: float = 0.0
        min_size_all_points: int = 0
        use_ransac: bool = False
        voxel_size: float = 0.0
        untouched: str = "x"

    c = apply_config(C(), kv)
    assert c.max_dist == 500.0
    assert c.min_size_all_points == 42
    assert c.use_ransac is True
    assert c.voxel_size == 12.5
    assert c.untouched == "x"


def test_scan_ranges():
    assert parse_scan_ranges("1:5,8,10:14:2") == [1, 2, 3, 4, 5, 8, 10, 12, 14]
    with pytest.raises(ValueError):
        parse_scan_ranges("a:b")
