"""Point-cloud segmentation — the TPU-native ``segmentation`` module
(ref src/segmentation/: Felzenszwalb-Huttenlocher graph segmentation,
fhsegmentation.cc + FHGraph/disjoint-set; SURVEY §2.6).

The expensive part — building the kNN graph with edge weights — runs as
the batched TPU KNN kernel; the FH merge loop is a classic union-find
over sorted edges (host, near-linear)."""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["FHParams", "fh_segmentation"]


@dataclasses.dataclass
class FHParams:
    k: int = 8  # kNN graph degree (ref --K)
    threshold: float = 50.0  # FH k-parameter (ref --threshold)
    min_size: int = 20  # post-merge minimum segment size (ref --minSize)


class _DisjointSet:
    """Union-find with rank + size (ref segmentation disjoint-set)."""

    def __init__(self, n: int):
        self.parent = np.arange(n)
        self.rank = np.zeros(n, np.int32)
        self.size = np.ones(n, np.int64)

    def find(self, x: int) -> int:
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> int:
        if self.rank[a] < self.rank[b]:
            a, b = b, a
        self.parent[b] = a
        self.size[a] += self.size[b]
        if self.rank[a] == self.rank[b]:
            self.rank[a] += 1
        return a


def fh_segmentation(points, params: FHParams | None = None) -> np.ndarray:
    """Segment a cloud; returns [N] int labels (compacted, 0-based).

    FH criterion: merge components A, B over edge w iff
    w <= min(Int(A) + k/|A|, Int(B) + k/|B|) with Int = max internal
    edge weight — exactly the reference's segmentation rule.
    """
    import jax.numpy as jnp

    from ..ops import knn as knn_ops

    params = params or FHParams()
    pts = np.asarray(points, np.float32)
    N = len(pts)
    if N == 0:
        return np.zeros(0, np.int64)
    k = min(params.k + 1, N)
    idx, d2 = knn_ops.knn_brute(
        jnp.asarray(pts), jnp.ones(N, bool), jnp.asarray(pts), jnp.ones(N, bool), k
    )
    idx = np.asarray(idx)[:, 1:]  # drop self
    w = np.sqrt(np.maximum(np.asarray(d2)[:, 1:], 0.0))
    src = np.repeat(np.arange(N), idx.shape[1])
    dst = idx.reshape(-1)
    ww = w.reshape(-1)
    # dedupe symmetric edges
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    key = lo.astype(np.int64) * N + hi
    _, uniq = np.unique(key, return_index=True)
    src, dst, ww = lo[uniq], hi[uniq], ww[uniq]
    order = np.argsort(ww, kind="stable")

    ds = _DisjointSet(N)
    internal = np.zeros(N)  # Int per root
    for e in order:
        a = ds.find(int(src[e]))
        b = ds.find(int(dst[e]))
        if a == b:
            continue
        wgt = ww[e]
        ta = internal[a] + params.threshold / ds.size[a]
        tb = internal[b] + params.threshold / ds.size[b]
        if wgt <= ta and wgt <= tb:
            r = ds.union(a, b)
            internal[r] = wgt
    # post-merge small components into their cheapest neighbor
    if params.min_size > 1:
        for e in order:
            a = ds.find(int(src[e]))
            b = ds.find(int(dst[e]))
            if a != b and (ds.size[a] < params.min_size or ds.size[b] < params.min_size):
                ds.union(a, b)
    roots = np.array([ds.find(i) for i in range(N)])
    _, labels = np.unique(roots, return_inverse=True)
    return labels


def region_growing_segmentation(
    points,
    normals=None,
    k: int = 8,
    angle_thresh_deg: float = 12.0,
    dist_thresh: float = 30.0,
    min_size: int = 10,
    max_iters: int = 200,
) -> np.ndarray:
    """Normal-coherent region growing — the reference's RG segmentation
    (src/preg6d/model/rg.cc; the smooth-surface complement to FH).

    TPU re-design: instead of seeded BFS growth, labels start unique
    and iteratively propagate the MINIMUM label across KNN edges whose
    endpoints are normal-coherent (angle < angle_thresh) and close
    (dist < dist_thresh) — a vectorized connected-components flood
    that converges in O(component diameter) sweeps.  Returns labels
    [N] (components smaller than min_size get -1)."""
    import jax
    import jax.numpy as jnp

    from ..ops import knn as knn_ops
    from ..ops.normals import estimate_normals_knn

    pts = jnp.asarray(np.asarray(points), jnp.float32)
    N = pts.shape[0]
    mask = jnp.ones(N, bool)
    if normals is None:
        normals = estimate_normals_knn(
            pts, mask, jnp.zeros(3, jnp.float32), k=max(k, 10)
        )
    else:
        normals = jnp.asarray(np.asarray(normals), jnp.float32)
    idx, d2 = knn_ops.knn_brute(pts, mask, pts, mask, k)
    ndot = jnp.abs(jnp.sum(normals[:, None, :] * normals[idx], axis=-1))
    cos_t = float(np.cos(np.deg2rad(angle_thresh_deg)))
    edge_ok = (ndot >= cos_t) & (d2 < dist_thresh**2)

    @jax.jit
    def sweep(labels):
        nbr = jnp.where(edge_ok, labels[idx], jnp.int32(N))
        best = jnp.minimum(labels, jnp.min(nbr, axis=1))
        # symmetric propagation: also push own label to neighbors via
        # scatter-min
        out = jnp.full(N + 1, jnp.int32(N))
        out = out.at[jnp.where(edge_ok, idx, N)].min(best[:, None])
        return jnp.minimum(best, out[:N])

    labels = jnp.arange(N, dtype=jnp.int32)
    for _ in range(max_iters):
        new = sweep(labels)
        if bool(jnp.all(new == labels)):
            break
        labels = new
    lab = np.asarray(labels)
    out = np.full(N, -1, np.int64)
    uniq, counts = np.unique(lab, return_counts=True)
    next_id = 0
    for u, c in zip(uniq, counts):
        if c >= min_size:
            out[lab == u] = next_id
            next_id += 1
    return out
