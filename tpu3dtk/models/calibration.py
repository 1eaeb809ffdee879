"""Camera calibration — the TPU-native ``calibration`` module core
(ref src/calibration/CalibrationToolbox.cc / Calibrator.cc: estimate
camera intrinsics + extrinsics from 3D↔2D pattern correspondences;
the reference wraps OpenCV's calibrateCamera and pattern detectors).

TPU design: the optimization core is re-expressed as autodiff — DLT
initialization (closed-form) followed by Levenberg-Marquardt on the
reprojection error with ``jax.grad``-derived Jacobians, batched over
all observations.  Pattern DETECTORS (AprilTag/Aruco/CCTag/chessboard,
AprilTag.cc etc.) are image-processing frontends outside this
framework's scan-processing scope; any external detector's
correspondences plug into :func:`calibrate_camera`.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["dlt_projection", "calibrate_camera", "reprojection_error"]


def dlt_projection(points3d: np.ndarray, points2d: np.ndarray) -> np.ndarray:
    """Closed-form DLT estimate of the 3x4 projection matrix from >= 6
    correspondences (the classic initializer)."""
    X = np.asarray(points3d, np.float64)
    x = np.asarray(points2d, np.float64)
    n = len(X)
    A = np.zeros((2 * n, 12))
    A[0::2, 0:3] = X
    A[0::2, 3] = 1
    A[0::2, 8:11] = -x[:, 0:1] * X
    A[0::2, 11] = -x[:, 0]
    A[1::2, 4:7] = X
    A[1::2, 7] = 1
    A[1::2, 8:11] = -x[:, 1:2] * X
    A[1::2, 11] = -x[:, 1]
    _, _, Vt = np.linalg.svd(A)
    P = Vt[-1].reshape(3, 4)
    if np.linalg.det(P[:, :3]) < 0:
        P = -P
    return P


def _decompose_P(P):
    """P -> (K upper-triangular, R, t) via RQ decomposition."""
    M = P[:, :3]
    # RQ via flipped QR
    F = np.flipud(np.fliplr(np.eye(3)))
    Q, R_ = np.linalg.qr((F @ M).T)
    K = F @ R_.T @ F
    R = F @ Q.T
    # positive diagonal of K
    S = np.diag(np.sign(np.diag(K)))
    K = K @ S
    R = S @ R
    if np.linalg.det(R) < 0:
        R = -R
        K = -K
    t = np.linalg.solve(K, P[:, 3])
    K = K / K[2, 2]
    return K, R, t


def reprojection_error(params, X, x):
    """Mean squared reprojection error (traceable).  params =
    [fx, fy, cx, cy, rx, ry, rz, tx, ty, tz, k1, k2]."""
    import jax.numpy as jnp

    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    rvec = params[4:7]
    t = params[7:10]
    k1, k2 = params[10], params[11]
    # Rodrigues
    th = jnp.sqrt(jnp.sum(rvec**2) + 1e-20)
    k = rvec / th
    Kx = jnp.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]]
    )
    R = (
        jnp.eye(3)
        + jnp.sin(th) * Kx
        + (1.0 - jnp.cos(th)) * (Kx @ Kx)
    )
    p = X @ R.T + t
    z = jnp.where(jnp.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
    xn = p[:, 0] / z
    yn = p[:, 1] / z
    r2 = xn * xn + yn * yn
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    u = fx * xn * radial + cx
    v = fy * yn * radial + cy
    du = u - x[:, 0]
    dv = v - x[:, 1]
    return jnp.mean(du * du + dv * dv)


def calibrate_camera(
    points3d: np.ndarray,
    points2d: np.ndarray,
    iterations: int = 200,
) -> dict:
    """Estimate intrinsics (fx, fy, cx, cy, k1, k2) + extrinsics (R, t)
    from 3D↔2D correspondences: DLT init + autodiff Levenberg-Marquardt
    on the reprojection error (the calibrateCamera role)."""
    import jax
    import jax.numpy as jnp

    X = np.asarray(points3d, np.float64)
    x = np.asarray(points2d, np.float64)
    P = dlt_projection(X, x)
    K, R, t = _decompose_P(P)
    # Rodrigues vector from R
    th = np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))
    if th < 1e-9:
        rvec = np.zeros(3)
    else:
        rvec = (
            th
            / (2 * np.sin(th))
            * np.array(
                [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
            )
        )
    p0 = np.array(
        [K[0, 0], K[1, 1], K[0, 2], K[1, 2], *rvec, *t, 0.0, 0.0],
        np.float64,
    )

    Xj = jnp.asarray(X)
    xj = jnp.asarray(x)
    err_fn = functools.partial(reprojection_error, X=Xj, x=xj)
    grad_fn = jax.jit(jax.value_and_grad(err_fn))
    hess_fn = jax.jit(jax.hessian(err_fn))

    p = jnp.asarray(p0)
    lam = 1e-3
    e, g = grad_fn(p)
    for _ in range(iterations):
        H = hess_fn(p)
        Hl = H + lam * jnp.diag(jnp.diag(H) + 1e-9)
        try:
            step = jnp.linalg.solve(Hl, g)
        except Exception:
            break
        p_new = p - step
        e_new, g_new = grad_fn(p_new)
        if float(e_new) < float(e):
            p, e, g = p_new, e_new, g_new
            lam = max(lam * 0.5, 1e-9)
            if float(jnp.linalg.norm(step)) < 1e-10:
                break
        else:
            lam = min(lam * 4.0, 1e6)
    p = np.asarray(p)
    rvec = p[4:7]
    th = np.linalg.norm(rvec)
    if th < 1e-12:
        R = np.eye(3)
    else:
        k = rvec / th
        Kx = np.array(
            [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
        )
        R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * (Kx @ Kx)
    return {
        "fx": float(p[0]), "fy": float(p[1]),
        "cx": float(p[2]), "cy": float(p[3]),
        "R": R, "t": p[7:10],
        "k1": float(p[10]), "k2": float(p[11]),
        "rms_px": float(np.sqrt(e)),
    }
