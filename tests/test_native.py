"""Native C++ parser tests."""

import numpy as np
import pytest

from tpu3dtk import native


def test_parse_matches_numpy(tmp_path, rng):
    p = tmp_path / "t.3d"
    data = rng.normal(0, 100, (500, 4))
    np.savetxt(p, data, fmt="%.10g")
    out = native.parse_table(str(p))
    if out is None:
        pytest.skip("native toolchain unavailable")
    np.testing.assert_allclose(out, data, rtol=1e-9)


def test_parse_ragged_and_comments(tmp_path):
    p = tmp_path / "r.3d"
    p.write_text("# header comment\n1 2 3\n4 5 6\nbad line here\n7 8 9 10\n11 12 13\n")
    out = native.parse_table(str(p))
    if out is None:
        pytest.skip("native toolchain unavailable")
    # 3-column rows kept; ragged 4-col row and non-numeric line dropped
    np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6], [11, 12, 13]])


def test_skip_header(tmp_path):
    p = tmp_path / "h.3d"
    p.write_text("81360\n1 2 3\n")
    out = native.parse_table(str(p), skip_lines=1)
    if out is None:
        pytest.skip("native toolchain unavailable")
    np.testing.assert_allclose(out, [[1, 2, 3]])


def test_ragged_fallback_via_loader(tmp_path):
    """Scan loader falls back to the native parser on ragged files."""
    from tpu3dtk.io.formats import get_format
    from tpu3dtk.io.scandir import read_scan

    (tmp_path / "scan000.3d").write_text("1 2 3\njunk\n4 5 6\n")
    (tmp_path / "scan000.pose").write_text("0 0 0\n0 0 0\n")
    s = read_scan(str(tmp_path), "000", get_format("uos"))
    assert s.size == 2
