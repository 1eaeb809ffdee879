"""GPS/UTM tests (gps module)."""

import numpy as np

from tpu3dtk.models.gps import latlon_to_utm, scan_to_utm


def test_central_meridian_anchors():
    # exact anchors: central meridian of zone 31 at the equator
    e, n, zone = latlon_to_utm(0.0, 3.0)
    assert zone == 31
    assert abs(e - 500000.0) < 1e-6 and abs(n) < 1e-6
    # N at 45 deg on the central meridian = k0 * WGS84 meridian arc
    e, n, _ = latlon_to_utm(45.0, 3.0)
    assert abs(e - 500000.0) < 1e-6
    assert abs(n - 0.9996 * 4984944.378) < 0.01


def test_wuerzburg_regression():
    e, n, zone = latlon_to_utm(49.7913, 9.9534)
    assert zone == 32
    assert abs(e - 568622.19) < 0.5
    assert abs(n - 5515862.94) < 0.5


def test_southern_hemisphere():
    e, n, zone = latlon_to_utm(-33.8688, 151.2093)  # Sydney
    assert zone == 56
    # UTM 56S plausibility band (false northing applied)
    assert 330000 < e < 340000
    assert 6.2e6 < n < 6.3e6


def test_scan_to_utm_shift():
    pts = np.array([[100.0, 50.0, 200.0]])  # cm
    out = scan_to_utm(pts, 49.7913, 9.9534, ref_alt_m=170.0)
    e, n, _ = latlon_to_utm(49.7913, 9.9534)
    np.testing.assert_allclose(out[0], [e + 1.0, n + 2.0, 170.5], atol=1e-6)
