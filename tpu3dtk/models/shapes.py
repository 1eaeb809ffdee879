"""Plane detection — the TPU-native shapes module (ref src/shapes/:
``Hough`` class with RHT/SHT variants over a ball accumulator,
hough.cc:82-400; driven by ``bin/planes``, README.planes.md; used by
preg6d plane-based registration).

TPU-first design (not the reference's cell-by-cell accumulator): the
*standard* Hough transform is one matmul — ``rho = P @ N^T`` for all
points against all candidate normals at once — followed by a batched
histogram.  The [N_points, N_dirs] rho matrix rides the MXU; peak
extraction and inlier removal run vectorized.  Iterative
detect-remove-repeat matches the reference's Hough::deletePoints flow.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["HoughParams", "Plane", "hough_accumulator", "detect_planes"]


@dataclasses.dataclass(frozen=True)
class Plane:
    """theta/phi normal + rho, plus inlier stats (ref ConvexPlane)."""

    normal: np.ndarray  # [3] unit
    rho: float  # signed distance from origin (n . p = rho)
    n_inliers: int
    center: np.ndarray  # [3] inlier centroid


@dataclasses.dataclass
class HoughParams:
    n_theta: int = 90  # polar resolution (ref MaxCountTheta-ish)
    n_phi: int = 180  # azimuth resolution
    n_rho: int = 100  # distance bins
    rho_max: float = 2000.0  # cm
    min_inliers: int = 50  # ref MinSizeAllPoints
    max_planes: int = 20  # ref MaxPlanes
    dist_tol: float = 10.0  # inlier band around the plane (cm)


def _directions(n_theta: int, n_phi: int) -> np.ndarray:
    """Quasi-uniform unit normals over the half sphere (the reference's
    AccumulatorBall uses a latitude-balanced ball design; equal-area
    spiral here — same role, no polar oversampling)."""
    n = n_theta * n_phi
    k = np.arange(n) + 0.5
    # Fibonacci half-sphere
    z = k / n  # (0, 1]: half sphere
    phi = k * (np.pi * (3.0 - np.sqrt(5.0)))
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)


def hough_accumulator(points, params: HoughParams):
    """Vote all points into the (direction, rho) accumulator.

    Returns (acc [D, n_rho] int32, dirs [D, 3], rho_edges).  One MXU
    matmul computes every point's rho against every direction
    (ref Hough::SHT loops point x cell; hough.cc).
    """
    import jax
    import jax.numpy as jnp

    pts = jnp.asarray(points, jnp.float32)
    dirs = jnp.asarray(_directions(params.n_theta, params.n_phi), jnp.float32)
    D = dirs.shape[0]
    rho = jnp.dot(pts, dirs.T, preferred_element_type=jnp.float32)  # [N, D]
    # signed rho in [-rho_max, rho_max] -> bin
    bin_w = (2.0 * params.rho_max) / params.n_rho
    bins = jnp.clip(
        ((rho + params.rho_max) / bin_w).astype(jnp.int32), 0, params.n_rho - 1
    )
    # per-direction histogram via one-hot segment sum over flat ids
    flat = bins + jnp.arange(D, dtype=jnp.int32)[None, :] * params.n_rho
    acc = jnp.zeros((D * params.n_rho,), jnp.int32)
    acc = acc.at[flat.reshape(-1)].add(1)
    return np.asarray(acc).reshape(D, params.n_rho), np.asarray(dirs), bin_w


def detect_planes(points, params: HoughParams | None = None) -> list[Plane]:
    """Iterative Hough plane extraction: vote, take the global maximum,
    least-squares refine on the inlier band, remove inliers, repeat
    (ref Hough::RHT + deletePoints flow)."""
    params = params or HoughParams()
    pts = np.asarray(points, np.float64)
    planes: list[Plane] = []
    remaining = pts
    for _ in range(params.max_planes):
        if len(remaining) < params.min_inliers:
            break
        acc, dirs, bin_w = hough_accumulator(
            remaining.astype(np.float32), params
        )
        d_idx, r_idx = np.unravel_index(np.argmax(acc), acc.shape)
        if acc[d_idx, r_idx] < params.min_inliers:
            break
        n = dirs[d_idx]
        rho = -params.rho_max + (r_idx + 0.5) * bin_w
        # inlier band
        d = remaining @ n - rho
        inl = np.abs(d) < max(params.dist_tol, bin_w)
        if inl.sum() < params.min_inliers:
            break
        # refine by iterated PCA: start on the coarse accumulator band,
        # re-fit on progressively tighter inlier bands so a coarse rho
        # bin (or slightly-off direction cell) cannot lock in a tilted
        # fit when clutter shares the initial band
        n_ref = n
        rho_ref = rho
        band0 = max(params.dist_tol, bin_w)
        for band in np.geomspace(band0, params.dist_tol, 3):
            dref = remaining @ n_ref - rho_ref
            sel = remaining[np.abs(dref) < band]
            if len(sel) < max(params.min_inliers // 2, 3):
                break
            c = sel.mean(0)
            cov = (sel - c).T @ (sel - c) / len(sel)
            w, V = np.linalg.eigh(cov)
            cand = V[:, 0]
            if cand @ n_ref < 0:
                cand = -cand
            n_ref = cand
            rho_ref = float(n_ref @ c)
        # final inliers against the refined plane
        d2 = pts @ n_ref - rho_ref
        # count against 'remaining' for removal
        dr = remaining @ n_ref - rho_ref
        inl2 = np.abs(dr) < params.dist_tol
        if inl2.sum() < params.min_inliers:
            remaining = remaining[~inl]
            continue
        planes.append(
            Plane(
                normal=n_ref,
                rho=rho_ref,
                n_inliers=int(inl2.sum()),
                center=remaining[inl2].mean(0),
            )
        )
        remaining = remaining[~inl2]
    return planes
