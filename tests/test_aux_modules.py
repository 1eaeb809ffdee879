"""curvefusion / thermo / calibration / building-model counterparts
(ref src/curvefusion/, src/thermo/, src/calibration/, src/model/)."""

import numpy as np
import pytest

from tests.conftest import make_room_cloud


# -- curvefusion -------------------------------------------------------

def test_associate_by_time():
    from tpu3dtk.models.curvefusion import associate_by_time

    ta = np.array([0.0, 1.0, 2.5, 7.0])
    tb = np.array([0.2, 2.0, 3.0, 6.0])
    j = associate_by_time(ta, tb)
    np.testing.assert_array_equal(j, [0, 0, 1, 3])


def test_fuse_trajectories_corrects_drift(rng):
    from tpu3dtk.models.curvefusion import FusionParams, fuse_trajectories

    t = np.linspace(0, 10, 200)
    truth = np.stack(
        [100 * np.cos(t * 0.5), 0 * t, 100 * np.sin(t * 0.5)], axis=1
    )
    drift = np.cumsum(rng.normal(0, 0.5, (200, 3)), axis=0)
    odo = truth + drift  # drifting laser odometry
    gps = truth + rng.normal(0, 1.0, (200, 3))  # noisy but unbiased
    fused, info = fuse_trajectories(
        t, odo, t, gps, FusionParams(window=16, stride=8, blend=0.3)
    )
    rmse_f = np.sqrt(((fused - truth) ** 2).sum(1).mean())
    rmse_o = np.sqrt(((odo - truth) ** 2).sum(1).mean())
    assert rmse_f < 0.7 * rmse_o, (rmse_f, rmse_o, info)
    assert info["rmse_after"] < info["rmse_before"]


# -- thermo ------------------------------------------------------------

def test_project_and_colorize():
    from tpu3dtk.models.thermo import Camera, colorize_scan, project_points

    cam = Camera(fx=400, fy=400, cx=160, cy=120, width=320, height=240)
    pts = np.array([
        [0.0, 0.0, 100.0],    # center pixel
        [10.0, 0.0, 100.0],   # right of center
        [0.0, 0.0, -50.0],    # behind the camera
    ])
    u, v, valid = project_points(pts, cam)
    assert valid[0] and valid[1] and not valid[2]
    assert abs(u[0] - 160) < 1e-9 and abs(v[0] - 120) < 1e-9
    assert u[1] > u[0]
    img = np.zeros((240, 320), np.float64)
    img[120, 160] = 42.0
    vals, vmask = colorize_scan(pts, img, cam)
    assert vals[0] == 42.0 and vmask[0]
    assert vals[2] == 0 and not vmask[2]


def test_detect_caliboard(rng):
    from tpu3dtk.models.thermo import detect_caliboard

    # a 100x60 board standing vertically + background clutter
    u = rng.uniform(-50, 50, 800)
    v = rng.uniform(-30, 30, 800)
    board = np.stack([u, v, np.full(800, 200.0)], axis=1)
    clutter = rng.uniform(-400, 400, (400, 3))
    clutter[:, 2] = rng.uniform(300, 800, 400)
    found = detect_caliboard(
        np.concatenate([board, clutter]), (100.0, 60.0),
        min_inliers=200,
    )
    assert found is not None
    c, n, inl = found
    assert abs(abs(n[2]) - 1.0) < 0.05  # normal along z
    assert np.linalg.norm(c[:2]) < 10.0 and abs(c[2] - 200.0) < 5.0


# -- calibration -------------------------------------------------------

def test_calibrate_camera_recovers_parameters(rng):
    from tpu3dtk.models.calibration import calibrate_camera

    fx, fy, cx, cy = 500.0, 480.0, 320.0, 240.0
    R = np.eye(3)
    t = np.array([5.0, -3.0, 120.0])
    X = rng.uniform(-50, 50, (120, 3))
    X[:, 2] += 100.0
    p = X @ R.T + t
    u = fx * p[:, 0] / p[:, 2] + cx
    v = fy * p[:, 1] / p[:, 2] + cy
    x = np.stack([u, v], axis=1) + rng.normal(0, 0.05, (120, 2))
    out = calibrate_camera(X, x)
    assert out["rms_px"] < 0.2, out["rms_px"]
    assert abs(out["fx"] - fx) / fx < 0.02
    assert abs(out["fy"] - fy) / fy < 0.02
    assert abs(out["cx"] - cx) < 10.0


# -- building model ----------------------------------------------------

def test_building_model_openings(rng):
    from tpu3dtk.models.building import build_model

    # a room with one wall containing a window-shaped hole
    size = 600.0
    pts = []
    n_face = 4000
    for axis in range(3):
        for side in (0.0, size):
            p = rng.uniform(0, size, (n_face, 3))
            p[:, axis] = side
            if axis == 2 and side == 0.0:
                # cut a 100x80 window at (250..350, 150..230)
                hole = (
                    (p[:, 0] > 250) & (p[:, 0] < 350)
                    & (p[:, 1] > 150) & (p[:, 1] < 230)
                )
                p = p[~hole]
            pts.append(p)
    cloud = np.concatenate(pts)
    from tpu3dtk.models.shapes import HoughParams

    model = build_model(
        cloud,
        HoughParams(min_inliers=800, max_planes=8, dist_tol=8.0),
        cell=10.0,
    )
    assert len(model["walls"]) >= 3
    assert len(model["floors"]) >= 1 and len(model["ceilings"]) >= 1
    all_openings = [o for ops in model["openings"].values() for o in ops]
    assert len(all_openings) >= 1, model["openings"]
    # the detected opening is window-sized
    o = max(all_openings, key=lambda o: -(o.fill))
    ext = o.hi - o.lo
    assert 60 <= ext.max() <= 160 and 50 <= ext.min() <= 120, ext


def test_chessboard_detection_and_calibration(rng):
    """Chessboard corner detection + planar intrinsics bootstrap (ref
    CalibrationToolbox's findChessboardCorners path)."""
    from tpu3dtk.models.calibration import (
        calibrate_from_chessboard_images, detect_chessboard,
    )

    # render a synthetic chessboard under a pinhole camera
    f, cx, cy = 500.0, 320.0, 240.0
    cols, rows = 7, 5
    sq = 30.0  # mm

    def render(rx, ry, tz):
        cr, sr = np.cos(rx), np.sin(rx)
        Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
        cr, sr = np.cos(ry), np.sin(ry)
        Ry = np.array([[cr, 0, sr], [0, 1, 0], [-sr, 0, cr]])
        R = Ry @ Rx
        t = np.array([-sq * (cols + 1) / 2, -sq * (rows + 1) / 2, tz])
        img = np.zeros((480, 640))
        yy, xx = np.mgrid[0:480, 0:640]
        # inverse-map each pixel ray onto the board plane z=0
        d = np.stack([(xx - cx) / f, (yy - cy) / f, np.ones_like(xx)], -1)
        d = d @ np.linalg.inv(R).T
        o = np.linalg.inv(R) @ (-t)
        lam = -o[2] / d[..., 2]
        bx = o[0] + lam * d[..., 0]
        by = o[1] + lam * d[..., 1]
        inside = (bx > 0) & (bx < (cols + 1) * sq) & \
            (by > 0) & (by < (rows + 1) * sq) & (lam > 0)
        par = (np.floor(bx / sq) + np.floor(by / sq)) % 2
        img[inside] = np.where(par[inside] > 0, 1.0, 0.0)
        return img

    img = render(0.15, -0.1, 400.0)
    corners = detect_chessboard(img, (cols, rows))
    assert corners is not None
    assert corners.shape == (cols * rows, 2)
    # corners must lie on the board's inner-corner projections: check
    # the first corner's neighborhood is a true checker crossing
    # (response already guaranteed); check grid ordering monotonicity
    grid = corners.reshape(rows, cols, 2)
    assert (np.diff(grid[:, :, 0], axis=1) * np.sign(
        np.diff(grid[0, :2, 0])
    ) > 0).all()

    imgs = [render(0.15, -0.1, 400.0), render(-0.2, 0.15, 450.0),
            render(0.05, 0.25, 380.0)]
    K, rms, used = calibrate_from_chessboard_images(
        imgs, (cols, rows), sq
    )
    assert used == 3
    assert K is not None
    assert abs(K[0, 0] - f) / f < 0.2
    assert rms < 3.0
