"""Closed-form 6-DoF pose minimizers operating on pair sufficient
statistics — the strategy objects of the reference
(``icp6Dminimizer`` interface, include/slam6d/icp6Dminimizer.h:31-88;
selected by ``slam6D -a 1..10``, src/slam6d/slam6D.cc:696-727).

TPU-first formulation: every minimizer consumes the *centered sufficient
statistics* (n, centroid_m, centroid_d, S) instead of a pair list, where

    S = sum_i (d_i - cd) (m_i - cm)^T      rows = data, cols = model

matching the reference's parallel-ICP reduction (icp6D.cc:144-191,
"Parallel Iterative Closest Point" Langis/Greenspan/Godin): on TPU the
per-thread partials become per-device partials combined with psum.  All
functions are pure, jit- and vmap-friendly, shape (…,3,3) batched.

Registered minimizers (reference algo ids):
  1 QUAT  Horn unit quaternion, max eigenvector of 4x4 Q (icp6Dquat.cc:38-145)
  2 SVD   Arun SVD of cross-covariance (icp6Dsvd.cc:39-160)
  3 ORTHO Horn orthonormal matrices — same optimum as SVD; implemented
          via the SVD route (icp6Dortho.cc)
  6 APX   small-angle linearization (icp6Dapx.cc)
  9 DUAL / 7 HELIX: TODO round 2 (each a small batched closed form)

Returned alignment T satisfies  m ≈ T·d  and is applied on the left of
the current pose (ref Scan::transformMatrix, scan.cc:878-898).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math3d

__all__ = [
    "PairStats",
    "pair_stats",
    "align_quat",
    "align_svd",
    "align_apx",
    "MINIMIZERS",
]

from typing import NamedTuple


class PairStats(NamedTuple):
    """Sufficient statistics of a weighted correspondence set."""

    n: jnp.ndarray  # scalar (float) number of pairs
    centroid_m: jnp.ndarray  # [3] model centroid
    centroid_d: jnp.ndarray  # [3] data centroid
    S: jnp.ndarray  # [3,3] centered cross-covariance sum_i (d-cd)(m-cm)^T
    Sdd: jnp.ndarray  # [3,3] centered data self-covariance sum_i (d-cd)(d-cd)^T
    sum_d2: jnp.ndarray  # scalar sum |m_i - d_i|^2 (for RMS error)


def pair_stats(m, d, w, accum_dtype=jnp.float32) -> PairStats:
    """Reduce matched pairs to sufficient statistics.

    m, d: [N,3] model/data points; w: [N] 0/1 (or soft) weights.
    Centered accumulation (two-pass) keeps f32 sums well-conditioned on
    TPU where f64 is emulated; the reference uses raw-product sums in f64
    (icp6Dquat.cc:55-98) — mathematically identical.
    """
    w = w.astype(accum_dtype)
    m = m.astype(accum_dtype)
    d = d.astype(accum_dtype)
    n = jnp.sum(w)
    ns = jnp.maximum(n, 1.0)
    cm = jnp.sum(w[:, None] * m, axis=0) / ns
    cd = jnp.sum(w[:, None] * d, axis=0) / ns
    dm = m - cm
    dd = d - cd
    wdd = w[:, None] * dd
    S = jnp.einsum("ni,nj->ij", wdd, dm)
    Sdd = jnp.einsum("ni,nj->ij", wdd, dd)
    diff = m - d
    sum_d2 = jnp.sum(w * jnp.sum(diff * diff, axis=1))
    return PairStats(n=n, centroid_m=cm, centroid_d=cd, S=S, Sdd=Sdd, sum_d2=sum_d2)


def merge_stats(stats: PairStats) -> PairStats:
    """Combine per-shard PairStats (leading axis) into one — the Langis
    partial-sum merge (icp6Dminimizer.h:61-82 Align_Parallel).  Used with
    psum/stacked shard outputs."""
    n = jnp.sum(stats.n)
    ns = jnp.maximum(n, 1.0)
    cm = jnp.sum(stats.n[:, None] * stats.centroid_m, axis=0) / ns
    cd = jnp.sum(stats.n[:, None] * stats.centroid_d, axis=0) / ns
    # shift each shard's centered S to the global centroids:
    # S_g = sum_k [ S_k + n_k (cd_k - cd)(cm_k - cm)^T ]
    dcd = stats.centroid_d - cd
    dcm = stats.centroid_m - cm
    S = jnp.sum(stats.S, axis=0) + jnp.einsum(
        "k,ki,kj->ij", stats.n, dcd, dcm
    )
    Sdd = jnp.sum(stats.Sdd, axis=0) + jnp.einsum(
        "k,ki,kj->ij", stats.n, dcd, dcd
    )
    return PairStats(
        n=n, centroid_m=cm, centroid_d=cd, S=S, Sdd=Sdd,
        sum_d2=jnp.sum(stats.sum_d2),
    )


def _finish(R, stats: PairStats):
    """Assemble T = [R | cm - R cd] and RMS error."""
    t = stats.centroid_m - R @ stats.centroid_d
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    err = jnp.sqrt(stats.sum_d2 / jnp.maximum(stats.n, 1.0))
    return T, err


def _max_eigvec4(Q, iters: int = 60):
    """Dominant eigenvector of a symmetric 4x4 via shifted power
    iteration — TPU-friendly replacement for eigh's QR sweeps (the
    reference solves the quartic characteristic polynomial instead,
    icp6Dquat.cc:171-320 Ferrari's method; same eigenpair).  The shift
    2·||Q||_F makes the target eigenvalue the largest in magnitude."""
    shift = 2.0 * jnp.sqrt(jnp.sum(Q * Q)) + 1e-12
    A = Q + shift * jnp.eye(4, dtype=Q.dtype)
    # A^64 v0 by 6 unrolled squarings (renormalized): fully fusable,
    # no while-loop per-iteration overhead on TPU
    A = A / (jnp.sqrt(jnp.sum(A * A)) + 1e-30)
    for _ in range(6):
        A = A @ A
        A = A / (jnp.sqrt(jnp.sum(A * A)) + 1e-30)
    v = A @ jnp.full((4,), 0.5, dtype=Q.dtype)
    # one Rayleigh-quotient polish step for f32 accuracy
    v = v / (jnp.linalg.norm(v) + 1e-30)
    v = (Q + shift * jnp.eye(4, dtype=Q.dtype)) @ v
    return v / (jnp.linalg.norm(v) + 1e-30)


def align_quat(stats: PairStats):
    """Horn's unit-quaternion method (ref icp6Dquat.cc:38-145).

    Builds the symmetric 4x4 Q from S/n and takes its maximum
    eigenvector via shifted power iteration.
    """
    S = (stats.S / jnp.maximum(stats.n, 1.0)).astype(jnp.float32)
    trace = jnp.trace(S)
    A23 = S[1, 2] - S[2, 1]
    A31 = S[2, 0] - S[0, 2]
    A12 = S[0, 1] - S[1, 0]
    Q = jnp.zeros((4, 4), dtype=S.dtype)
    Q = Q.at[0, 0].set(trace)
    Q = Q.at[0, 1:].set(jnp.array([A23, A31, A12], dtype=S.dtype))
    Q = Q.at[1:, 0].set(jnp.array([A23, A31, A12], dtype=S.dtype))
    Q = Q.at[1:, 1:].set(S + S.T - jnp.eye(3, dtype=S.dtype) * trace)
    q = _max_eigvec4(Q)  # [w, x, y, z] in the reference's convention
    R = math3d.quat_to_matrix3(q).astype(S.dtype)
    return _finish(R, stats)


def align_svd(stats: PairStats):
    """Arun's SVD method (ref icp6Dsvd.cc:39-160): H = S (rows=data),
    R = V U^T with reflection fix via sign of det."""
    H = stats.S.astype(jnp.float32)
    U, _, Vt = jnp.linalg.svd(H)
    V = Vt.T
    det = jnp.linalg.det(V @ U.T)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=H.dtype))
    D = D.at[2, 2].set(jnp.sign(det))
    R = V @ D @ U.T
    return _finish(R, stats)


def align_apx(stats: PairStats):
    """Small-angle linearization (ref icp6Dapx.cc): R ≈ I + [a]x.

    Minimizing sum |d~ + a x d~ - m~|^2 over the rotation vector a gives
    the normal equations  A a = b  with
        A = tr(Sdd) I - Sdd          (Sdd = centered data covariance)
        b = sum d~ x m~ = axial(S)   (S = centered cross-covariance)
    The exact exponential map of a is returned (the reference applies
    the raw linearized matrix; the exponential is strictly better and
    identical to first order).
    """
    n = jnp.maximum(stats.n, 1.0)
    S = (stats.S / n).astype(jnp.float32)
    Sdd = (stats.Sdd / n).astype(jnp.float32)
    b = jnp.array(
        [S[1, 2] - S[2, 1], S[2, 0] - S[0, 2], S[0, 1] - S[1, 0]],
        dtype=S.dtype,
    )
    A = jnp.trace(Sdd) * jnp.eye(3, dtype=S.dtype) - Sdd
    a = jnp.linalg.solve(A, b)
    # build rotation from small-angle vector (exact exponential map)
    th = jnp.linalg.norm(a) + 1e-30
    k = a / th
    K = jnp.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], dtype=S.dtype
    )
    R = (
        jnp.eye(3, dtype=S.dtype)
        + jnp.sin(th) * K
        + (1.0 - jnp.cos(th)) * (K @ K)
    )
    return _finish(R, stats)


MINIMIZERS = {
    "quat": align_quat,  # -a 1
    "svd": align_svd,  # -a 2
    "ortho": align_svd,  # -a 3 (same optimum; ref icp6Dortho.cc)
    "apx": align_apx,  # -a 6
}
