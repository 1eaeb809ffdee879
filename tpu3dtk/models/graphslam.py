"""GraphSLAM — globally consistent Lu/Milios-style 6-DoF relaxation
("LUM"), the TPU-native ``lum6DEuler`` (ref src/slam6d/lum6Deuler.cc:94-477,
base class graphSlam6D, src/slam6d/graphSlam6D.cc).

Math (identical to the reference):

Per graph link (i, j), with point pairs (a_k from scan i, b_k from scan
j, both in the current global frame):
    mid = (a+b)/2,  d = a-b
    MZ  = [Σd ; Σ(-z·dy + y·dz) ; Σ(-y·dx + x·dy) ; Σ(z·dx - x·dz)]
    MM  = the 6x6 Gram matrix of the linearized pose observation
    D   = MM⁻¹ MZ,  ss = Σ‖residual(D)‖² / (2m-3)
    C   = MM/ss,  CD = MZ/ss            (lum6Deuler.cc:141-232)

Assembly (FillGB3D, lum6Deuler.cc:265-303): for link (a, b) with scan 0
fixed,  B[a] += CD, B[b] -= CD, G[aa] += C, G[bb] += C, G[ab] -= C,
G[ba] -= C.  Solve G X = B, then per scan the pose correction is
Ha⁻¹ X_i subtracted from the Euler pose (lum6Deuler.cc:375-455).

TPU-first design: the reference loops links in OpenMP and scatters under
a critical section; here *all* links' (C, CD) are produced by one
batched kernel — NN search and MZ/MM reductions vmapped over links,
chunked with lax.map — and assembled with segment-sums.  The dense
6n x 6n SPD solve is tiny (n ≤ thousands) and runs in f64 (host/XLA);
the reference uses CXSparse cholesky (graphSlam6D.cc:345-366).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math3d
from ..core.scan import TPUScan
from ..io.frames import AlgoType
from ..ops import nn as nn_ops

__all__ = [
    "build_proximity_graph",
    "link_covariances",
    "assemble_GB",
    "lum_pose_corrections",
    "LumParams",
    "do_graph_slam",
]


def read_net_graph(path: str) -> np.ndarray:
    """Explicit pose-graph file: first line = #scans, second = #links,
    then one 'from to' pair per line (ref Graph::Graph(netfile),
    src/slam6d/graph.cc:53-75; used by the bremen_city config's
    ``-n bremen.net``).  Returns links [L, 2] int32."""
    with open(path) as f:
        tokens = f.read().split()
    n_scans = int(tokens[0])
    n_links = int(tokens[1])
    vals = list(map(int, tokens[2 : 2 + 2 * n_links]))
    links = np.asarray(vals, np.int32).reshape(-1, 2)
    if links.max(initial=0) >= n_scans:
        raise ValueError(f"{path}: link index beyond {n_scans} scans")
    return links


def build_proximity_graph(
    positions: np.ndarray, cldist2: float, loopsize: int
) -> np.ndarray:
    """Links = consecutive chain + all (j,k), |k-j| > loopsize, with pose
    distance² < cldist2 (ref Graph::Graph(int,double,int),
    src/slam6d/graph.cc:108-130).  positions: [S,3].  Returns [L,2] int."""
    S = len(positions)
    links = [(i, i + 1) for i in range(S - 1)]
    d2 = (
        ((positions[:, None, :] - positions[None, :, :]) ** 2).sum(-1)
        if S > 1
        else np.zeros((S, S))
    )
    for j in range(S):
        for k in range(j + 1, S):
            if (k - j) > loopsize and d2[j, k] < cldist2:
                links.append((j, k))
    return np.asarray(links, dtype=np.int32)


def _one_link_stats(model_g, mmask, tgt_g, tmask, max_dist2):
    """C (6,6), CD (6,) for one link from global-frame padded points.

    model_g = scan i (p1/a), tgt_g = scan j (p2/b): pairs are NN of j's
    points among i's points (Scan::getPtPairs convention, the link order
    used in FillGB3D)."""
    idx, d2, found = nn_ops.nn_brute(tgt_g, tmask, model_g, mmask, max_dist2)
    a = model_g[idx]
    b = tgt_g
    w = found.astype(jnp.float32)
    m = jnp.sum(w)

    mid = 0.5 * (a + b)
    d = a - b
    x, y, z = mid[:, 0], mid[:, 1], mid[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    def s(v):
        return jnp.sum(w * v)

    MZ = jnp.stack(
        [
            s(dx),
            s(dy),
            s(dz),
            s(-z * dy + y * dz),
            s(-y * dx + x * dy),
            s(z * dx - x * dz),
        ]
    )
    sx, sy, sz = s(x), s(y), s(z)
    xpy = s(x * x + y * y)
    xpz = s(x * x + z * z)
    ypz = s(y * y + z * z)
    xy, xz, yz = s(x * y), s(x * z), s(y * z)
    MM = jnp.array(
        [
            [m, 0, 0, 0, -sy, sz],
            [0, m, 0, -sz, sx, 0],
            [0, 0, m, sy, 0, -sx],
            [0, -sz, sy, ypz, -xz, -xy],
            [-sy, sx, 0, -xz, xpy, -yz],
            [sz, 0, -sx, -xy, -yz, xpz],
        ]
    )
    ok = m > 2
    MMr = jnp.where(ok, MM, jnp.eye(6, dtype=MM.dtype))
    D = jnp.linalg.solve(MMr, MZ)
    # residual variance (lum6Deuler.cc:196-215)
    rx = dx - (D[0] - y * D[4] + z * D[5])
    ry = dy - (D[1] - z * D[3] + x * D[4])
    rz = dz - (D[2] + y * D[3] - x * D[5])
    ss = s(rx * rx + ry * ry + rz * rz) / jnp.maximum(2 * m - 3, 1.0)
    good = ok & (ss >= 1e-13)
    inv_ss = jnp.where(good, 1.0 / jnp.maximum(ss, 1e-13), 0.0)
    C = MM * inv_ss
    CD = MZ * inv_ss
    C = jnp.where(good, C, 0.0)
    CD = jnp.where(good, CD, 0.0)
    return C, CD, m


@functools.partial(jax.jit, static_argnames=("chunk",))
def link_covariances(
    points_g, masks, links, max_dist2, chunk: int = 4
):
    """Batched (C, CD) for all links.

    points_g: [S, N, 3] f32 global-frame reduced points per scan;
    masks: [S, N]; links: [L, 2] int32.  Returns C [L,6,6], CD [L,6],
    m [L].  Chunked with lax.map to bound the [chunk, N, N] distance
    working set.
    """
    def one(link):
        i, j = link[0], link[1]
        return _one_link_stats(
            points_g[i], masks[i], points_g[j], masks[j], max_dist2
        )

    return jax.lax.map(one, links, batch_size=chunk)


def assemble_GB(links: np.ndarray, C: np.ndarray, CD: np.ndarray, n_scans: int):
    """Dense G (6n x 6n), B (6n) with scan 0 fixed (FillGB3D,
    lum6Deuler.cc:265-303).  f64 host assembly (tiny)."""
    n = n_scans - 1
    G = np.zeros((6 * n, 6 * n))
    B = np.zeros(6 * n)
    C = np.asarray(C, np.float64)
    CD = np.asarray(CD, np.float64)
    for (li, (f, t)) in enumerate(np.asarray(links)):
        a, b = int(f) - 1, int(t) - 1
        if a >= 0:
            B[a * 6 : a * 6 + 6] += CD[li]
            G[a * 6 : a * 6 + 6, a * 6 : a * 6 + 6] += C[li]
        if b >= 0:
            B[b * 6 : b * 6 + 6] -= CD[li]
            G[b * 6 : b * 6 + 6, b * 6 : b * 6 + 6] += C[li]
        if a >= 0 and b >= 0:
            G[a * 6 : a * 6 + 6, b * 6 : b * 6 + 6] -= C[li]
            G[b * 6 : b * 6 + 6, a * 6 : a * 6 + 6] -= C[li]
    return G, B


def lum_pose_corrections(poses_pos, poses_theta, X):
    """Ha⁻¹ X per scan (lum6Deuler.cc:375-436).  poses_*: [n,3] for
    scans 1..n (scan 0 fixed); X: [n,6].  Returns result [n,6] to be
    subtracted from (pos, theta)."""
    def one(pos, theta, Xi):
        xa, ya, za = pos
        tx, ty = theta[0], theta[1]
        ctx, stx = jnp.cos(tx), jnp.sin(tx)
        cty, sty = jnp.cos(ty), jnp.sin(ty)
        Ha = jnp.eye(6, dtype=X.dtype)
        Ha = Ha.at[0, 4].set(-za * ctx + ya * stx)
        Ha = Ha.at[0, 5].set(ya * cty * ctx + za * stx * cty)
        Ha = Ha.at[1, 3].set(za)
        Ha = Ha.at[1, 4].set(-xa * stx)
        Ha = Ha.at[1, 5].set(-xa * ctx * cty + za * sty)
        Ha = Ha.at[2, 3].set(-ya)
        Ha = Ha.at[2, 4].set(xa * ctx)
        Ha = Ha.at[2, 5].set(-xa * cty * stx - ya * sty)
        Ha = Ha.at[3, 5].set(sty)
        Ha = Ha.at[4, 4].set(stx)
        Ha = Ha.at[4, 5].set(ctx * cty)
        Ha = Ha.at[5, 4].set(ctx)
        Ha = Ha.at[5, 5].set(-stx * cty)
        return jnp.linalg.solve(Ha, Xi)

    return jax.vmap(one)(poses_pos, poses_theta, X)


@dataclasses.dataclass
class LumParams:
    max_dist_match2: float = 625.0  # -D distSLAM squared
    iterations: int = 50  # -I iterSLAM
    epsilon: float = 0.5  # --epsSLAM (mean position shift, cm)
    pad_multiple: int = 512
    link_chunk: int = 4


def do_graph_slam(
    scans: list[TPUScan], links: np.ndarray, params: LumParams
) -> float:
    """Run LUM iterations until mean pose shift < epsilon
    (doGraphSlam6D, lum6Deuler.cc:314-477).  Mutates scan poses; writes
    LUM-tagged frames.  Returns final mean position shift."""
    if len(scans) < 2 or len(links) == 0:
        return 0.0
    cap = max(len(s.reduced_local()) for s in scans)
    cap = ((cap + params.pad_multiple - 1) // params.pad_multiple) * params.pad_multiple
    locals_pad = np.zeros((len(scans), cap, 3), np.float32)
    masks = np.zeros((len(scans), cap), bool)
    for si, s in enumerate(scans):
        r = s.reduced_local()
        locals_pad[si, : len(r)] = r
        masks[si, : len(r)] = True
    locals_j = jnp.asarray(locals_pad)
    masks_j = jnp.asarray(masks)
    links_j = jnp.asarray(links, jnp.int32)

    ret = np.inf
    it = 0
    while it < params.iterations and ret > params.epsilon:
        mats = np.stack([s.transMat for s in scans]).astype(np.float32)
        points_g = jax.vmap(math3d.transform3)(jnp.asarray(mats), locals_j)
        C, CD, m = link_covariances(
            points_g, masks_j, links_j,
            jnp.float32(params.max_dist_match2),
            chunk=params.link_chunk,
        )
        G, B = assemble_GB(links, np.asarray(C), np.asarray(CD), len(scans))
        try:
            X = np.linalg.solve(G, B)
        except np.linalg.LinAlgError:
            X = np.linalg.lstsq(G, B, rcond=None)[0]
        X = X.reshape(-1, 6)
        pos = np.stack([s.rPos for s in scans[1:]])
        theta = np.stack([s.rPosTheta for s in scans[1:]])
        result = np.asarray(
            lum_pose_corrections(
                jnp.asarray(pos), jnp.asarray(theta), jnp.asarray(X)
            )
        )
        sum_position_diff = 0.0
        for k, s in enumerate(scans[1:]):
            new_pos = pos[k] - result[k, :3]
            new_theta = theta[k] - result[k, 3:]
            T = np.asarray(math3d.euler_to_matrix4(new_pos, new_theta))
            s.set_pose(T, AlgoType.LUM)
            sum_position_diff += float(np.linalg.norm(result[k, :3]))
        scans[0].add_frame(AlgoType.LUM)
        ret = sum_position_diff / len(scans)
        it += 1
    return ret
