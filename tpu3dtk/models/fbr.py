"""Feature-based registration ("fbr") — panorama features + RANSAC
rigid estimation (ref src/slam6d/fbr/: panorama -> OpenCV SIFT/ORB
features (feature.cc) -> matcher (feature_matcher.cc) -> RANSAC
registration (registration.cc); SURVEY §2.6).

Pipeline: project both scans to range panoramas (ops.panorama), detect
ORB/SIFT features on the normalized range images, ratio-test match,
back-project matches to 3D via the panorama index map, then RANSAC over
3-point samples with the Horn closed form; final pose refit on inliers.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core import math3d
from ..ops.panorama import PanoramaParams, project_panorama

__all__ = ["FbrParams", "register_fbr", "estimate_rigid_ransac"]


@dataclasses.dataclass
class FbrParams:
    panorama: PanoramaParams = dataclasses.field(default_factory=PanoramaParams)
    detector: str = "orb"  # "orb" | "sift" (ref fbr feature.cc choices)
    n_features: int = 2000
    ratio: float = 0.8  # Lowe ratio test
    ransac_iters: int = 500
    inlier_dist: float = 25.0  # cm (ref registration dist threshold)
    min_inliers: int = 10


def _horn(m: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Closed-form rigid fit m ~ T d (numpy f64, small K)."""
    cm, cd = m.mean(0), d.mean(0)
    H = (d - cd).T @ (m - cm)
    U, _, Vt = np.linalg.svd(H)
    D = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ D @ U.T
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = cm - R @ cd
    return T


def estimate_rigid_ransac(
    model_pts: np.ndarray,
    data_pts: np.ndarray,
    iters: int = 500,
    inlier_dist: float = 25.0,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """RANSAC rigid transform from matched 3D pairs
    (ref fbr registration.cc: 3-point minimal samples).  Returns
    (T [4,4], inlier mask)."""
    rng = np.random.default_rng(seed)
    K = len(model_pts)
    if K < 3:
        raise ValueError("need >= 3 matches")
    best_inl = np.zeros(K, bool)
    for _ in range(iters):
        sel = rng.choice(K, 3, replace=False)
        try:
            T = _horn(model_pts[sel], data_pts[sel])
        except np.linalg.LinAlgError:
            continue
        res = np.linalg.norm(
            data_pts @ T[:3, :3].T + T[:3, 3] - model_pts, axis=1
        )
        inl = res < inlier_dist
        if inl.sum() > best_inl.sum():
            best_inl = inl
    if best_inl.sum() >= 3:
        T = _horn(model_pts[best_inl], data_pts[best_inl])
    else:
        T = np.eye(4)
    return T, best_inl


def register_fbr(
    model_local: np.ndarray,
    data_local: np.ndarray,
    params: FbrParams | None = None,
) -> dict:
    """Estimate the pose of `data` relative to `model` from panorama
    features.  Both inputs are local-frame [N, 3] clouds.

    Returns {"T": [4,4] with model ≈ T·data, "n_matches", "n_inliers"}.
    """
    import cv2

    params = params or FbrParams()
    pano_m = project_panorama(model_local, params.panorama)
    pano_d = project_panorama(data_local, params.panorama)
    img_m = pano_m.to_image()
    img_d = pano_d.to_image()

    if params.detector == "sift":
        det = cv2.SIFT_create(nfeatures=params.n_features)
        norm = cv2.NORM_L2
    else:
        det = cv2.ORB_create(nfeatures=params.n_features)
        norm = cv2.NORM_HAMMING
    kp_m, des_m = det.detectAndCompute(img_m, None)
    kp_d, des_d = det.detectAndCompute(img_d, None)
    if des_m is None or des_d is None or len(kp_m) < 3 or len(kp_d) < 3:
        return {"T": np.eye(4), "n_matches": 0, "n_inliers": 0}

    matcher = cv2.BFMatcher(norm)
    raw = matcher.knnMatch(des_d, des_m, k=2)
    good = [
        m for pair in raw if len(pair) == 2
        for m, n in [pair] if m.distance < params.ratio * n.distance
    ]
    if len(good) < 3:
        return {"T": np.eye(4), "n_matches": len(good), "n_inliers": 0}

    uv_d = np.array([kp_d[m.queryIdx].pt for m in good])
    uv_m = np.array([kp_m[m.trainIdx].pt for m in good])
    idx_d, ok_d = pano_d.back_project(uv_d)
    idx_m, ok_m = pano_m.back_project(uv_m)
    ok = ok_d & ok_m
    if ok.sum() < 3:
        return {"T": np.eye(4), "n_matches": len(good), "n_inliers": 0}
    P_m = np.asarray(model_local)[idx_m[ok]]
    P_d = np.asarray(data_local)[idx_d[ok]]
    T, inl = estimate_rigid_ransac(
        P_m, P_d, params.ransac_iters, params.inlier_dist
    )
    if inl.sum() < params.min_inliers:
        return {"T": np.eye(4), "n_matches": int(ok.sum()), "n_inliers": int(inl.sum())}
    return {"T": T, "n_matches": int(ok.sum()), "n_inliers": int(inl.sum())}
