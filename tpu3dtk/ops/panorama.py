"""Panorama projections of 3D scans — the TPU-native fbr ``panorama``
(ref src/slam6d/fbr/panorama.cc; projection methods listed in
include/slam6d/fbr/fbr_global.h:64-70: EQUIRECTANGULAR, CYLINDRICAL,
MERCATOR, ...; used by feature-based registration, range-image
reduction in scan_red, and range-image normals).

All projections are pure tensor math on [N, 3] points: spherical
angles -> pixel coords -> z-buffered scatter of range/reflectance and
the source point index (for back-projection to 3D).
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["PanoramaParams", "Panorama", "project_panorama"]

METHODS = ("equirectangular", "cylindrical", "mercator")


@dataclasses.dataclass
class PanoramaParams:
    width: int = 720
    height: int = 360
    method: str = "equirectangular"
    max_range: float | None = None
    min_v_angle: float = -np.pi / 3  # vertical field of view
    max_v_angle: float = np.pi / 3


@dataclasses.dataclass
class Panorama:
    range: np.ndarray  # [H, W] f32, 0 where empty
    index: np.ndarray  # [H, W] int32 source point index, -1 empty
    reflectance: np.ndarray | None  # [H, W] f32 or None
    params: PanoramaParams

    def to_image(self) -> np.ndarray:
        """Range normalized to uint8 (ref getRangeImage -> png)."""
        r = self.range
        top = r.max() if r.max() > 0 else 1.0
        return (np.clip(r / top, 0, 1) * 255).astype(np.uint8)

    def back_project(self, uv: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Pixel coords [K, 2] (x, y) -> source point indices + valid
        mask (for matching features back to 3D)."""
        x = np.clip(np.round(uv[:, 0]).astype(int), 0, self.params.width - 1)
        y = np.clip(np.round(uv[:, 1]).astype(int), 0, self.params.height - 1)
        idx = self.index[y, x]
        return idx, idx >= 0


def project_panorama(
    points: np.ndarray,
    params: PanoramaParams | None = None,
    reflectance: np.ndarray | None = None,
) -> Panorama:
    """Project local-frame scan points to a panorama.

    Angle conventions follow the reference's cartesianToPolar: azimuth
    around the y (up) axis, elevation from the horizontal plane.
    Nearest-point-wins z-buffering via lexsort (deepest first, nearest
    overwrites last).
    """
    params = params or PanoramaParams()
    pts = np.asarray(points, np.float64)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    r = np.linalg.norm(pts, axis=1)
    valid = r > 1e-9
    if params.max_range is not None:
        valid &= r <= params.max_range
    azim = np.arctan2(x, z)  # [-pi, pi]
    elev = np.arcsin(np.clip(y / np.maximum(r, 1e-12), -1, 1))

    W, H = params.width, params.height
    u = (azim + np.pi) / (2 * np.pi) * (W - 1)
    lo, hi = params.min_v_angle, params.max_v_angle
    if params.method == "equirectangular":
        t = (elev - lo) / (hi - lo)
    elif params.method == "cylindrical":
        t = (np.tan(np.clip(elev, lo, hi)) - np.tan(lo)) / (
            np.tan(hi) - np.tan(lo)
        )
    elif params.method == "mercator":
        def merc(a):
            return np.log(np.tan(a) + 1.0 / np.cos(a))
        t = (merc(np.clip(elev, lo, hi)) - merc(lo)) / (merc(hi) - merc(lo))
    else:
        raise ValueError(f"unknown method {params.method!r}; known {METHODS}")
    valid &= (elev >= lo) & (elev <= hi)
    v = (1.0 - t) * (H - 1)  # top = max elevation

    ui = np.clip(np.round(u).astype(np.int64), 0, W - 1)
    vi = np.clip(np.round(v).astype(np.int64), 0, H - 1)
    pix = vi * W + ui

    rng_img = np.zeros(H * W, np.float32)
    idx_img = np.full(H * W, -1, np.int32)
    refl_img = np.zeros(H * W, np.float32) if reflectance is not None else None

    sel = np.where(valid)[0]
    order = sel[np.argsort(-r[sel], kind="stable")]  # far first, near wins
    rng_img[pix[order]] = r[order].astype(np.float32)
    idx_img[pix[order]] = order.astype(np.int32)
    if refl_img is not None:
        refl_img[pix[order]] = np.asarray(reflectance)[order]

    return Panorama(
        range=rng_img.reshape(H, W),
        index=idx_img.reshape(H, W),
        reflectance=refl_img.reshape(H, W) if refl_img is not None else None,
        params=params,
    )
