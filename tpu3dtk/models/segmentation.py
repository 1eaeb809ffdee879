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
