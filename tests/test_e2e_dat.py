"""End-to-end registration on the bundled reference dataset
(``dat/``: 3 scans x 81360 points) — the de-facto smoke test of the
reference README (``slam6D --max=500 -r 10.2 -i 20 --metascan dat``,
README.md:66-74)."""

import numpy as np
import pytest

from tpu3dtk.core.scan import TPUScan
from tpu3dtk.io import frames as frames_io
from tpu3dtk.io.scandir import PointFilter, read_scan_dir
from tpu3dtk.models.icp import IcpParams
from tpu3dtk.models.sequence import SequenceRegistration


@pytest.fixture(scope="module")
def registered(tmp_path_factory):
    import tests.conftest as c

    if not __import__("os").path.isdir(c.REFERENCE_DAT):
        pytest.skip("reference dat/ not available")
    scans = []
    for raw in read_scan_dir(
        c.REFERENCE_DAT, format="uos", point_filter=PointFilter(range_max=500.0)
    ):
        s = TPUScan.from_raw(raw)
        s.set_reduction(10.2, 1)
        scans.append(s)
    reg = SequenceRegistration(
        params=IcpParams(
            max_dist_match2=25.0**2, max_iterations=50, epsilon=1e-7
        ),
        metascan=True,
    )
    results = reg.run(scans)
    return scans, results


def test_three_scans_registered(registered):
    scans, results = registered
    assert len(results) == 2
    for r in results:
        assert r["iterations"] >= 2
        assert r["pairs"] > 1000
        # final RMS error in cm: dat scans overlap well; expect < 10
        assert r["error"] < 10.0, r


def test_poses_moved_but_bounded(registered):
    scans, _ = registered
    # dat odometry starts at identity for all scans; ICP must find the
    # relative motion (scans were taken meters apart -> nonzero poses)
    p1 = scans[1].transMat[:3, 3]
    p2 = scans[2].transMat[:3, 3]
    assert 10.0 < np.linalg.norm(p1) < 1000.0
    assert 10.0 < np.linalg.norm(p2) < 1000.0


def test_rematch_is_stationary(registered):
    """Consistency: re-matching scan1 against scan0 from the registered
    pose must barely move it (the registration is a fixed point)."""
    from tpu3dtk.models import icp as icp_mod
    import jax.numpy as jnp

    cap = 16384
    m, mm = scans0_pad = registered[0][0].reduced_padded(cap)
    import numpy as np
    from tpu3dtk.core import math3d

    scans, _ = registered
    mg = np.asarray(math3d.transform3(scans[0].transMat, m)).astype(np.float32)
    t, tm = scans[1].reduced_padded(cap)
    T0 = scans[1].transMat
    res = icp_mod.icp_pair(
        jnp.asarray(mg), jnp.asarray(mm), jnp.asarray(t), jnp.asarray(tm),
        jnp.asarray(T0, dtype=jnp.float32),
        max_dist_match2=625.0, epsilon=1e-5, max_iterations=100,
    )
    move = np.linalg.norm(np.asarray(res.T)[:3, 3] - T0[:3, 3])
    assert move < 2.0, move


def test_frames_export(registered, tmp_path):
    scans, _ = registered
    for s in scans:
        mats = np.stack([f[0] for f in s.frames])
        types = [f[1] for f in s.frames]
        path = str(tmp_path / f"scan{s.identifier}.frames")
        frames_io.write_frames(path, mats, types)
        final = frames_io.final_pose(path)
        np.testing.assert_allclose(final, s.transMat, atol=1e-10)
