"""Iso-surface extraction from voxel scalar fields (the mesh-output
stage of the reference's tsdf (vdb2mesh.cc marching cubes) and mesh
(Poisson exportMesh) modules).

Naive surface nets instead of marching cubes: one vertex per
sign-change cell at the centroid of its edge crossings, one quad per
sign-change edge connecting the 4 adjacent cell vertices — fully
vectorized numpy (no 256-case tables), watertight on closed fields,
and the standard modern alternative to MC.
"""

from __future__ import annotations

import numpy as np

__all__ = ["surface_nets"]


def _corner_offsets():
    return np.array(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)]
    )  # [8, 3], index bit order (x, y, z)


def surface_nets(
    field: np.ndarray,
    valid: np.ndarray | None = None,
    origin=(0.0, 0.0, 0.0),
    voxel: float = 1.0,
):
    """Extract the zero iso-surface of ``field`` [X, Y, Z].

    valid: optional bool mask of trustworthy samples (e.g. TSDF weight
    > 0); cells touching invalid samples are skipped.  Returns
    (vertices [V, 3] f64 in world units, triangles [T, 3] int32).
    """
    f = np.asarray(field, np.float64)
    X, Y, Z = f.shape
    if valid is None:
        valid = np.ones_like(f, bool)
    origin = np.asarray(origin, np.float64)

    neg = f < 0
    offs = _corner_offsets()
    # per-cell corner stacks [X-1, Y-1, Z-1, 8]
    cs = np.stack(
        [
            neg[o[0] : o[0] + X - 1, o[1] : o[1] + Y - 1, o[2] : o[2] + Z - 1]
            for o in offs
        ],
        axis=-1,
    )
    cv = np.stack(
        [
            valid[
                o[0] : o[0] + X - 1, o[1] : o[1] + Y - 1, o[2] : o[2] + Z - 1
            ]
            for o in offs
        ],
        axis=-1,
    )
    mixed = cs.any(-1) & ~cs.all(-1) & cv.all(-1)  # sign change, all valid
    cell_idx = np.full(mixed.shape, -1, np.int64)
    ci, cj, ck = np.nonzero(mixed)
    cell_idx[ci, cj, ck] = np.arange(len(ci))

    # vertex = centroid of the cell's edge zero-crossings
    fvals = np.stack(
        [
            f[o[0] : o[0] + X - 1, o[1] : o[1] + Y - 1, o[2] : o[2] + Z - 1][
                ci, cj, ck
            ]
            for o in offs
        ],
        axis=-1,
    )  # [C, 8]
    edges = [
        (a, b)
        for a in range(8)
        for b in range(a + 1, 8)
        if bin(a ^ b).count("1") == 1
    ]  # the 12 cube edges
    acc = np.zeros((len(ci), 3))
    cnt = np.zeros(len(ci))
    for a, b in edges:
        fa, fb = fvals[:, a], fvals[:, b]
        cross = (fa < 0) != (fb < 0)
        t = np.where(cross, fa / np.where(fa - fb == 0, 1.0, fa - fb), 0.0)
        pa = offs[a][None, :]
        pb = offs[b][None, :]
        pt = pa + t[:, None] * (pb - pa)
        acc += np.where(cross[:, None], pt, 0.0)
        cnt += cross
    centroid = acc / np.maximum(cnt, 1.0)[:, None]
    base = np.stack([ci, cj, ck], axis=1)
    verts = (base + centroid + 0.0) * voxel + origin

    # faces: one quad per sign-change edge, across the 4 adjacent cells
    tris = []

    def quads_along(axis):
        """Edges along ``axis`` between corner (i,j,k)/(i+..)."""
        # edge grid: all voxel corners where the +axis neighbor exists
        sl_a = [slice(0, X), slice(0, Y), slice(0, Z)]
        sl_b = list(sl_a)
        sl_a[axis] = slice(0, f.shape[axis] - 1)
        sl_b[axis] = slice(1, f.shape[axis])
        na = neg[tuple(sl_a)]
        nb = neg[tuple(sl_b)]
        cross = na != nb
        ei, ej, ek = np.nonzero(cross)
        e = np.stack([ei, ej, ek], axis=1)
        # 4 adjacent cells: subtract 0/1 along the two OTHER axes
        ax2, ax3 = [a for a in range(3) if a != axis]
        quads = []
        for d2 in (1, 0):
            for d3 in (1, 0):
                c = e.copy()
                c[:, ax2] -= d2
                c[:, ax3] -= d3
                quads.append(c)
        # cell order around the edge (consistent winding):
        # (−1,−1), (0,−1), (0,0), (−1,0) in (ax2, ax3)
        order = [0, 2, 3, 1]  # from the d2/d3 loop above
        quads = [quads[o] for o in order]
        inb = np.ones(len(e), bool)
        for c in quads:
            for a in range(3):
                inb &= (c[:, a] >= 0) & (c[:, a] < mixed.shape[a])
        vids = []
        okv = inb.copy()
        for c in quads:
            cc = np.clip(c, 0, np.array(mixed.shape) - 1)
            v = cell_idx[cc[:, 0], cc[:, 1], cc[:, 2]]
            okv &= v >= 0
            vids.append(v)
        v0, v1, v2, v3 = [v[okv] for v in vids]
        flip = na[ei, ej, ek][okv]  # inside at low end -> flip winding
        q = np.stack([v0, v1, v2, v3], axis=1)
        qf = q[:, ::-1]
        q = np.where(flip[:, None], qf, q)
        tris.append(np.stack([q[:, 0], q[:, 1], q[:, 2]], 1))
        tris.append(np.stack([q[:, 0], q[:, 2], q[:, 3]], 1))

    for axis in range(3):
        quads_along(axis)
    if tris:
        faces = np.concatenate(tris, axis=0).astype(np.int32)
    else:
        faces = np.zeros((0, 3), np.int32)
    return verts, faces
