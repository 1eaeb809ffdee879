"""Normal estimation — TPU-native ``calculateNormalsKNN`` family
(ref src/slam6d/normals.cc:220-560, include/slam6d/normals.h:16-49).

Per point: PCA over its k nearest neighbors; the normal is the
eigenvector of the smallest eigenvalue of the neighborhood covariance,
flipped to face the viewpoint (scanner position), exactly the
reference's orientation rule (normals.cc: flip if n·(p - rPos) > 0).

TPU design: batched KNN (ops.knn), per-point 3x3 covariance by gathered
segment reductions, then a *closed-form* symmetric 3x3 eigensolver
(trigonometric Cardano + cross-product eigenvector extraction) — fully
vectorized, no per-point QR iterations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import knn as knn_ops

__all__ = ["estimate_normals_knn", "smallest_eigenvector_sym3"]


def smallest_eigenvector_sym3(A):
    """Eigenvector of the smallest eigenvalue of symmetric (...,3,3).

    Analytic: eigenvalues via the trigonometric solution of the
    characteristic cubic; eigenvector via the largest cross product of
    the rows of (A - λI) (robust rank-2 null-space extraction).
    """
    A = A.astype(jnp.float32)
    tr = jnp.trace(A, axis1=-2, axis2=-1)
    q = tr / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B)
    r = detB / jnp.maximum(2.0 * p**3, 1e-30)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eigenvalues: q + 2p cos(phi + 2πk/3); smallest at k=1 (phi+2π/3)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    M = A - lam_min[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], axis=-1), axis=-1)
    cands = jnp.stack([c01, c02, c12], axis=-2)
    v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    # degenerate (isotropic) neighborhoods: fall back to +y
    norm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    fallback = jnp.zeros_like(v).at[..., 1].set(1.0)
    v = jnp.where(norm > 1e-12, v / jnp.maximum(norm, 1e-30), fallback)
    return v


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals_knn(points, mask, viewpoint, k: int = 20):
    """Normals for a padded cloud from k-NN PCA.

    points: [N,3] f32 (scanner/local or global frame); mask: [N];
    viewpoint: [3] scanner position in the same frame (ref rPos arg of
    calculateNormalsKNN).  Returns normals [N,3] f32, unit length,
    oriented toward the viewpoint.
    """
    points = points.astype(jnp.float32)
    idx, d2 = knn_ops.knn_brute(points, mask, points, mask, k)
    nbrs = points[idx]  # [N, k, 3]
    valid = mask[idx]  # padded model points excluded by +inf d2 already,
    # but when fewer than k valid points exist top_k returns masked ones
    w = valid.astype(jnp.float32)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(nbrs * w, axis=1) / cnt
    cen = (nbrs - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", cen, cen) / cnt[..., None]
    n = smallest_eigenvector_sym3(cov)
    # orient: flip so the normal points toward the viewpoint
    to_vp = viewpoint[None, :] - points
    flip = jnp.sum(n * to_vp, axis=-1) < 0.0
    n = jnp.where(flip[:, None], -n, n)
    return jnp.where(mask[:, None], n, 0.0)
