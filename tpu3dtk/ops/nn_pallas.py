"""Pallas cell-list NN kernel — the TPU-native re-design of the
reference's CUDA uniform-grid NN (src/cuda/grid_kernel.cu:314-420
kernel_FindNN: bucket points, search 27 neighbor buckets) and the
performance replacement for the kd-tree hot loop (SURVEY §3 hot loop #1).

Design (cell-list, sort-based — no pointer chasing):

1. Model and query points are bucketed into cells of edge ``max_dist``
   and sorted by z-major cell id (ix*ny + iy)*nz + iz.
2. Queries are processed in uniform chunks of T sorted queries.  The
   27-cell neighborhoods of every cell in a chunk's id span [lo, hi]
   union into 9 *contiguous* sorted-model ranges — one per (dx, dy)
   neighbor column, spanning ids [lo+off-1, hi+off+1] with
   off = (dx*ny + dy)*nz (the ±1 covers dz; z-wraps only add harmless
   extra candidates, never lose true ones).
3. The kernel DMAs the 9 ranges (padded to a static RB) from HBM into
   VMEM, computes the [T, 9·RB] distance matrix via an MXU matmul on
   chunk-centered coordinates (centering keeps the matmul expansion
   exact in f32), masks invalid rows, and arg-mins.

Work per query is O(27·occupancy) instead of O(M): the algorithmic win
of the reference's grid, with the memory behavior TPUs want — big
contiguous DMAs and one dense matmul per chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nn_cell_list", "plan_cell_list"]


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


def _cross_rank(q, m, precise: bool):
    """Cross term qᵀm for distance RANKING, [8, TQ] x [8, TM] -> [TQ, TM].

    precise=False (default): split each operand into bf16 hi + lo and
    sum the 3 significant products — 3 MXU passes with ~16-bit relative
    accuracy.  The omitted q_lo·m_lo term bounds the rank error at
    ~1.2e-5 · extent² (measured 10.4 cm² max at ±800 cm extents, 0.07%
    of neighbors swapped between near-equal candidates); the *accept*
    distance is always recomputed exactly outside the kernel, so only
    the choice among candidates closer than the bound can differ from
    exact ranking.  Mosaic has no 3-pass HIGH lowering, hence the manual
    split; measured 1.8 ms vs 3.1 ms per 16k x 16k NN pass on v5e.

    precise=True: 6-pass HIGHEST — exact-f32 ranking, for km-scale
    extents where 1.2e-5·ext² approaches the match gate.
    """
    dn = (((0,), (0,)), ((), ()))
    if precise:
        return jax.lax.dot_general(
            q, m, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    pd = jax.lax.Precision.DEFAULT
    qh32 = q.astype(jnp.bfloat16).astype(jnp.float32)
    qh = qh32.astype(jnp.bfloat16)
    ql = (q - qh32).astype(jnp.bfloat16)
    mh32 = m.astype(jnp.bfloat16).astype(jnp.float32)
    mh = mh32.astype(jnp.bfloat16)
    ml = (m - mh32).astype(jnp.bfloat16)
    f32 = jnp.float32
    return (
        jax.lax.dot_general(qh, mh, dn, preferred_element_type=f32, precision=pd)
        + jax.lax.dot_general(qh, ml, dn, preferred_element_type=f32, precision=pd)
        + jax.lax.dot_general(ql, mh, dn, preferred_element_type=f32, precision=pd)
    )


def plan_cell_list(model, mmask, query, qmask, max_dist, chunk=256):
    """Host-side plan: sort both clouds by cell id and build the
    per-chunk scalar table.  Returns a dict of device arrays + static
    metadata (dims, RB).  numpy math: runs once per (model, query) pair.
    """
    model = np.asarray(model, np.float32)
    query = np.asarray(query, np.float32)
    mmask = np.asarray(mmask)
    qmask = np.asarray(qmask)
    cell = float(max_dist)
    valid_m = model[mmask]
    valid_q = query[qmask]
    lo = np.minimum(
        valid_m.min(0) if len(valid_m) else np.zeros(3),
        valid_q.min(0) if len(valid_q) else np.zeros(3),
    ).astype(np.float32)
    origin = lo - cell  # one-cell margin so ids stay >= nz inside
    ext = (
        np.maximum(
            valid_m.max(0) if len(valid_m) else np.zeros(3),
            valid_q.max(0) if len(valid_q) else np.zeros(3),
        )
        - origin
    )
    nx, ny, nz = (int(np.ceil(e / cell)) + 2 for e in ext)
    C = nx * ny * nz

    def cell_ids(pts, mask):
        ij = np.floor((pts - origin) / cell).astype(np.int64)
        ij = np.clip(ij, 0, np.array([nx - 1, ny - 1, nz - 1]))
        ids = (ij[:, 0] * ny + ij[:, 1]) * nz + ij[:, 2]
        ids[~mask] = C  # sentinel: sorts last
        return ids

    mid = cell_ids(model, mmask)
    morder = np.argsort(mid, kind="stable")
    mid_s = mid[morder]
    model_s = model[morder]
    # CSR over cell ids (only needed at chunk granularity below)
    cell_start = np.searchsorted(mid_s, np.arange(C + 1))

    qid = cell_ids(query, qmask)
    qorder = np.argsort(qid, kind="stable")
    qid_s = qid[qorder]
    Q = len(query)
    W = _cdiv(Q, chunk)

    # per-chunk: query id span -> 9 model ranges.  DMA slices must be
    # 128-lane aligned, so store the aligned-down start + shift + len.
    offs = [
        (dx * ny + dy) * nz for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ]
    table = np.zeros((W, 2 + 27), np.int32)
    rb = 1
    M = len(model)
    for w in range(W):
        a, b = w * chunk, min((w + 1) * chunk, Q)
        ids = qid_s[a:b]
        ids = ids[ids < C]
        table[w, 0] = a
        table[w, 1] = len(ids)
        if len(ids) == 0:
            continue
        lo_id, hi_id = int(ids[0]), int(ids[-1])
        for r, off in enumerate(offs):
            s_id = max(0, lo_id + off - 1)
            e_id = min(C, hi_id + off + 2)
            if s_id >= C or e_id <= 0 or s_id >= e_id:
                table[w, 2 + 3 * r] = 0
                table[w, 3 + 3 * r] = 0
                table[w, 4 + 3 * r] = 0
                continue
            rs = int(cell_start[s_id])
            re = int(cell_start[e_id])
            rs_al = (rs // 128) * 128
            table[w, 2 + 3 * r] = rs_al
            table[w, 3 + 3 * r] = rs - rs_al  # shift within the slice
            table[w, 4 + 3 * r] = re - rs  # true length
            rb = max(rb, (re - rs) + (rs - rs_al))

    RB = _round_up(max(rb, 128), 128)
    # transposed [3, Npad] layout: points on the lane dimension; pad so
    # aligned RB-slices never run off the end
    # 8 coordinate rows (sublane tile): rows 0-2 = xyz, rest zero —
    # zero rows drop out of every dot product
    Mpad = _round_up(M + RB + 128, 128)
    model_pad = np.zeros((8, Mpad), np.float32)
    model_pad[:3, :M] = model_s.T
    model_pad[:3, M:] = 1e30
    qpad = _round_up(max(Q, 1), chunk)
    query_pad = np.zeros((8, qpad), np.float32)
    query_pad[:3, :Q] = query[qorder].T
    return {
        "model_sorted": jnp.asarray(model_pad),
        "msrc": jnp.asarray(morder.astype(np.int32)),
        "query_sorted": jnp.asarray(query_pad),
        "qorder": jnp.asarray(qorder.astype(np.int32)),
        "table": jnp.asarray(table),
        "RB": int(RB),
        "chunk": int(chunk),
        "W": int(W),
        "Q": Q,
    }




@functools.partial(jax.jit, static_argnames=("RB", "chunk", "W", "interpret"))
def _run_kernel(table, query_sorted, model_sorted, RB, chunk, W, interpret=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(W,),
        in_specs=[
            # i - i keeps the index i32 (a literal 0 lowers to i64
            # under jax_enable_x64 and fails Mosaic legalization)
            pl.BlockSpec((8, chunk), lambda i, tab: (i - i, i)),
            # model stays in HBM; kernel DMAs 128-aligned lane slices
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            # i - i keeps the index i32 (a literal 0 lowers to i64
            # under jax_enable_x64 and fails Mosaic legalization)
            pl.BlockSpec((8, chunk), lambda i, tab: (i - i, i)),
            # i - i keeps the index i32 (a literal 0 lowers to i64
            # under jax_enable_x64 and fails Mosaic legalization)
            pl.BlockSpec((8, chunk), lambda i, tab: (i - i, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, 9 * RB), jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    qpad = query_sorted.shape[1]

    # 8 sublane rows per output tile (min f32 tile); row 0 is the data
    out_shape = [
        jax.ShapeDtypeStruct((8, W * chunk), jnp.int32),
        jax.ShapeDtypeStruct((8, W * chunk), jnp.float32),
    ]

    def kernel(tab_ref, q_ref, model_hbm, idx_ref, d2_ref, cand, sems):
        i = pl.program_id(0)
        # 9 candidate-range DMAs: 128-aligned lane slices of the [3, N]
        # model into flat [3, 9*RB] scratch (np.int32 indices — python
        # ints lower to i64 under x64)
        for r in range(9):
            st = pl.multiple_of(tab_ref[i, 2 + 3 * r], 128)
            pltpu.make_async_copy(
                model_hbm.at[:, pl.ds(st, RB)],
                cand.at[:, pl.ds(np.int32(r * RB), RB)],
                sems.at[np.int32(r)],
            ).start()
        q = q_ref[:]  # [8, T]
        # center on the chunk's first query: sorted-by-cell queries and
        # their candidate ranges are spatially LOCAL, so centered
        # magnitudes stay at chunk extent (~tens of cells) and the
        # 3-pass split ranking (_cross_rank) is safe at any cloud size.
        # |q|^2 is constant per row and irrelevant to the argmin; the
        # winner's true distance is recomputed outside.
        ctr = q[:, 0:1]
        qc = q - ctr
        # ranges processed ONE AT A TIME with a running (min, argmin):
        # VMEM working set is [T, RB] instead of [T, 9·RB] (the
        # monolithic form OOMs scoped vmem at city-scale RB), compute
        # on range r overlaps the in-flight DMAs of ranges r+1.., and
        # the winner row is just base_r + argmin (no one-hot lookup).
        bestd = jnp.full((chunk, 1), jnp.float32(3.4e38))
        bestrow = jnp.zeros((chunk, 1), jnp.int32)
        # two-tier range width: per-chunk requirements are heavy-tailed
        # (p50 is a few hundred rows, RB covers the p99), so ranges
        # that fit a quarter-width slice rank on [T, RB/4] under
        # lax.cond — at city scale most do, cutting the matmul + argmin
        # work ~3-4x without touching exactness
        # floor 256: a width-128 argmin trips a Mosaic vector-cast
        # legalization bug (f32->i32 materialization) on v5e
        RBS = max(256, (RB // 4 // 128) * 128)

        def rank_range(c, width, shift, ln):
            cc = c - ctr
            cross = _cross_rank(qc, cc, precise=False)  # [T, width]
            c2 = jnp.sum(cc * cc, axis=0, keepdims=True)
            d2 = c2 - 2.0 * cross  # ranking score (d^2 - |q|^2)
            jj = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
            valid = (jj >= shift) & (jj < shift + ln)
            d2 = jnp.where(valid, d2, jnp.float32(3.4e38))
            bm = jnp.min(d2, axis=1, keepdims=True)          # [T, 1]
            ba = jax.lax.argmin(d2, 1, jnp.int32)[:, None]    # [T, 1]
            return bm, ba

        for r in range(9):
            st = pl.multiple_of(tab_ref[i, 2 + 3 * r], 128)
            pltpu.make_async_copy(
                model_hbm.at[:, pl.ds(st, RB)],
                cand.at[:, pl.ds(np.int32(r * RB), RB)],
                sems.at[np.int32(r)],
            ).wait()
            shift = tab_ref[i, 3 + 3 * r]
            ln = tab_ref[i, 4 + 3 * r]

            def small(_, r=r, shift=shift, ln=ln):
                c = cand[:, r * RB: r * RB + RBS]
                return rank_range(c, RBS, shift, ln)

            def big(_, r=r, shift=shift, ln=ln):
                c = cand[:, r * RB:(r + 1) * RB]
                return rank_range(c, RB, shift, ln)

            if RBS < RB:
                bm, ba = jax.lax.cond(
                    shift + ln <= RBS, small, big, 0
                )
            else:
                bm, ba = big(0)
            rows = tab_ref[i, 2 + 3 * r] + ba
            better = bm < bestd
            bestd = jnp.where(better, bm, bestd)
            bestrow = jnp.where(better, rows, bestrow)
        idx_ref[:, :] = jnp.broadcast_to(bestrow.T, (8, chunk))
        d2_ref[:, :] = jnp.broadcast_to(bestd.T, (8, chunk))

    idx2, d22 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(table, query_sorted, model_sorted)
    return idx2[0], d22[0]


def nn_cell_list(model, mmask, query, qmask, max_dist2, chunk: int = 256):
    """Grid NN via the Pallas cell-list kernel.  Same contract as
    ops.nn.nn_brute: returns (idx [Q] int32 into `model`, d2 [Q] f32,
    found [Q] bool with strict d2 < max_dist2)."""
    max_dist = float(np.sqrt(max_dist2))
    plan = plan_cell_list(model, mmask, query, qmask, max_dist, chunk)
    interpret = jax.default_backend() == "cpu"
    rows, d2s = _run_kernel(
        plan["table"],
        plan["query_sorted"],
        plan["model_sorted"],
        plan["RB"],
        plan["chunk"],
        plan["W"],
        interpret=interpret,
    )
    Q = plan["Q"]
    rows = np.asarray(rows)[:Q]
    M = np.asarray(model).shape[0]
    rows_c = np.clip(rows, 0, M - 1)
    msrc = np.asarray(plan["msrc"])
    idx_sorted_space = msrc[rows_c]
    # exact recompute in original coordinates (host numpy: cheap and
    # backend-independent; query_sorted is [8, N] transposed/padded)
    qs = np.asarray(plan["query_sorted"])[:3].T[:Q].astype(np.float64)
    mref = np.asarray(model, np.float64)
    diff = qs - mref[idx_sorted_space]
    d2x = np.einsum("ij,ij->i", diff, diff).astype(np.float32)
    found_sorted = (d2x < max_dist2) & (rows < M)
    # unsort back to caller's query order
    qorder = np.asarray(plan["qorder"])
    inv = np.zeros(Q, np.int64)
    inv[qorder] = np.arange(Q)
    idx = idx_sorted_space[inv]
    d2 = d2x[inv]
    found = found_sorted[inv] & np.asarray(qmask)
    return idx, d2, found


# ---------------------------------------------------------------------------
# Device-planned cell list — sublinear NN INSIDE lax.while_loop
# ---------------------------------------------------------------------------
#
# plan_cell_list (above) plans on the host, so it cannot serve the ICP
# while_loop where the query cloud moves every iteration.  Here the
# QUERY side of the plan is re-expressed as traceable device ops: sort
# the transformed queries by dense z-major cell id, derive each chunk's
# 9 contiguous sorted-model ranges with searchsorted-style gathers into
# the [W, 2+27] scalar-prefetch table, and call the SAME kernel
# (_run_kernel).  The model side (sort + CSR) is built once per match
# in a separate jit (the parameter-entry requirement).  Per-iteration
# NN cost drops from O(Q*M) MXU work to O(Q * occupancy) DMA+MXU work
# — the kd-tree's sublinearity, in-loop, on TPU.
#
# Exactness guards (driver re-matches with brute when either fires):
#   - overflow: some chunk's candidate range exceeded the static RB
#   - oob: some point left the static grid box (poses drifted past the
#     margin the spec was sized with)


from typing import NamedTuple  # noqa: E402


class CellListModel(NamedTuple):
    """Sorted-model side of the device cell list (traceable)."""

    points: jnp.ndarray        # [M, 3] ORIGINAL model points (match frame)
    mmask: jnp.ndarray         # [M] bool model validity mask
    model_sorted: jnp.ndarray  # [8, Mpad] transposed sorted coords
    msrc: jnp.ndarray          # [M] original index of each sorted row
    cell_start: jnp.ndarray    # [C+1] CSR over dense cell ids
    origin: jnp.ndarray        # [3]
    cell: jnp.ndarray          # scalar


def _dense_ids(pts, origin, cell, dims):
    nx, ny, nz = dims
    ij = jnp.floor((pts - origin) / cell).astype(jnp.int32)
    ijc = jnp.clip(ij, 0, jnp.asarray([nx - 1, ny - 1, nz - 1]))
    ids = (ijc[:, 0] * ny + ijc[:, 1]) * nz + ijc[:, 2]
    oob = jnp.any((ij < 0) | (ij != ijc), axis=1)
    return ids, oob


def build_cell_list_model(
    model, mmask, origin, cell, *, dims, RB: int, perm=(0, 1, 2)
) -> tuple[CellListModel, jnp.ndarray]:
    """Traceable model-side build.  Returns (CellListModel, oob_count).
    Call inside a SEPARATE jit from the query loop so the arrays enter
    the loop as parameters.  ``perm``: the spec's axis permutation —
    binning AND the stored kernel coordinates run in permuted space
    (distances are permutation-invariant); clm.points stays original.
    """
    nx, ny, nz = dims
    C = nx * ny * nz
    M = model.shape[0]
    model_p = model[:, perm]
    ids, oob = _dense_ids(model_p, origin, cell, dims)
    ids = jnp.where(mmask, ids, C)  # masked sorts last
    order = jnp.argsort(ids)
    ids_s = ids[order]
    cell_start = jnp.searchsorted(
        ids_s, jnp.arange(C + 1, dtype=ids_s.dtype)
    ).astype(jnp.int32)
    Mpad = _round_up(M + RB + 128, 128)
    mT = jnp.full((8, Mpad), jnp.float32(1e30))
    mT = mT.at[3:, :].set(0.0)
    mT = mT.at[:3, :M].set(model_p[order].T.astype(jnp.float32))
    return (
        CellListModel(
            points=model,
            mmask=mmask,
            model_sorted=mT,
            msrc=order.astype(jnp.int32),
            cell_start=cell_start,
            origin=origin,
            cell=cell,
        ),
        jnp.sum((oob & mmask).astype(jnp.int32)),
    )


@functools.partial(jax.jit, static_argnames=("dims", "chunk", "perm"))
def cell_list_plan_device(query, qmask, clm: CellListModel, *, dims,
                          chunk: int = 256, perm=(0, 1, 2)):
    """Device-side query plan: sort queries by dense cell id and build
    the per-chunk scalar table.  Returns (table, qT, order, maxlen,
    oob_count).  A SEPARATE jit from the kernel call on purpose —
    measured: the three-jit chain (plan → kernel → post) runs ~100x
    faster than the same ops fused into one program (XLA schedules the
    scatter/gather graph around the pallas_call pathologically)."""
    nx, ny, nz = dims
    C = nx * ny * nz
    N = query.shape[0]
    W = _cdiv(N, chunk)
    pad = W * chunk - N
    query_p = query[:, perm]
    ids, oob = _dense_ids(query_p, clm.origin, clm.cell, dims)
    ids = jnp.where(qmask, ids, C)
    order = jnp.argsort(ids)
    ids_s = jnp.pad(ids[order], (0, pad), constant_values=C)
    q_s = jnp.pad(query_p[order], ((0, pad), (0, 0)))
    idc = ids_s.reshape(W, chunk)
    valid_q = idc < C
    lo = jnp.min(jnp.where(valid_q, idc, C), axis=1)
    hi = jnp.max(jnp.where(valid_q, idc, -1), axis=1)
    any_valid = valid_q.any(axis=1)
    table = jnp.zeros((W, 2 + 27), jnp.int32)
    offs = [(dx * ny + dy) * nz for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    maxlen = jnp.int32(0)
    for r, off in enumerate(offs):
        rs = clm.cell_start[jnp.clip(lo + (off - 1), 0, C)]
        re = jnp.maximum(clm.cell_start[jnp.clip(hi + (off + 2), 0, C)], rs)
        rs_al = (rs // 128) * 128
        shift = rs - rs_al
        ln = jnp.where(any_valid, re - rs, 0)
        maxlen = jnp.maximum(maxlen, jnp.max(shift + ln))
        table = table.at[:, 2 + 3 * r].set(rs_al)
        table = table.at[:, 3 + 3 * r].set(shift)
        table = table.at[:, 4 + 3 * r].set(ln)
    qT = jnp.zeros((8, W * chunk), jnp.float32)
    qT = qT.at[:3, :].set(q_s.T.astype(jnp.float32))
    oob_n = jnp.sum((oob & qmask).astype(jnp.int32))
    return table, qT, order, maxlen, oob_n


@jax.jit
def cell_list_post_device(rows, order, query, qmask, clm: CellListModel,
                          max_dist2):
    """Map kernel rows back to original model indices + exact d2."""
    N = query.shape[0]
    M = clm.points.shape[0]
    idx_sorted = clm.msrc[jnp.clip(rows[:N], 0, M - 1)]
    inv = jnp.zeros(N, jnp.int32).at[order].set(
        jnp.arange(N, dtype=jnp.int32)
    )
    idx = idx_sorted[inv]
    diff = query - clm.points[idx]
    d2 = jnp.sum(diff * diff, axis=1)
    found = qmask & (d2 < max_dist2)
    return idx, d2, found


@functools.partial(jax.jit, static_argnames=("RB", "chunk", "cap_over"))
def _overflow_lane(
    table, order, query, qmask, idx, d2, found, clm: CellListModel,
    max_dist2, *, RB: int, chunk: int, cap_over: int,
):
    """Exactness repair for over-budget chunks: a sorted-query chunk
    whose candidate range exceeds the static RB (rare — chunks that
    straddle slow-axis row transitions; RB is sized at the p99.5 chunk
    requirement) had its range CLAMPED in the kernel, so its queries
    may have missed their true NN.  This lane re-matches just those
    queries (compacted to a static cap_over batch) against the full
    model with the MXU brute kernel and merges the results.  Runs
    under lax.cond — zero cost when no chunk overflowed.

    Returns (idx, d2, found, n_over) — exactness holds iff
    n_over <= cap_over (the driver's fallback guard)."""
    W = table.shape[0]
    N = query.shape[0]
    req = jnp.max(table[:, 3::3] + table[:, 4::3], axis=1)  # [W]
    chunk_over = req > RB
    # per-ORIGINAL-query overflow flag: sorted position k belongs to
    # chunk k // chunk and original index order[k]
    over_sorted = jnp.repeat(chunk_over, chunk)[:N]
    q_over = jnp.zeros(N, bool).at[order].set(over_sorted) & qmask
    n_over = jnp.sum(q_over.astype(jnp.int32))

    def fix(args):
        idx, d2, found = args
        sel = jnp.argsort(~q_over)[:cap_over]
        sub_mask = q_over[sel]
        idx_b, d2_b, found_b = nn_brute_mxu(
            query[sel], sub_mask, clm.points, clm.mmask, max_dist2
        )
        idx = idx.at[sel].set(jnp.where(sub_mask, idx_b, idx[sel]))
        d2 = d2.at[sel].set(jnp.where(sub_mask, d2_b, d2[sel]))
        found = found.at[sel].set(
            jnp.where(sub_mask, found_b, found[sel])
        )
        return idx, d2, found

    idx, d2, found = jax.lax.cond(
        n_over > 0, fix, lambda a: a, (idx, d2, found)
    )
    return idx, d2, found, n_over


def nn_cell_list_chained(query, qmask, clm: CellListModel, max_dist2,
                         *, dims, RB: int, chunk: int = 256,
                         perm=(0, 1, 2), cap_over: int = 8192):
    """Cell-list NN as a chain of jits (all dispatches async; no host
    sync inside).  Chunks whose candidate range exceeds RB are repaired
    exactly by the brute overflow lane (see _overflow_lane).  Returns
    (idx, d2, found, overflow, oob) — overflow/oob are DEVICE scalars
    the driver checks lazily; overflow means the lane capacity was
    exceeded and the whole match must be redone with brute."""
    table, qT, order, maxlen, oob = cell_list_plan_device(
        query, qmask, clm, dims=dims, chunk=chunk, perm=tuple(perm)
    )
    # clamp lengths so the kernel mask never exceeds RB; clamped chunks
    # are repaired by the overflow lane afterwards
    table_c = table.at[:, 4::3].set(
        jnp.maximum(jnp.minimum(table[:, 4::3], RB - table[:, 3::3]), 0)
    )
    N = query.shape[0]
    W = _cdiv(N, chunk)
    interpret = jax.default_backend() != "tpu"
    rows, _scores = _run_kernel(
        table_c, qT, clm.model_sorted, RB, chunk, W, interpret=interpret
    )
    idx, d2, found = cell_list_post_device(
        rows, order, query, qmask, clm, jnp.float32(max_dist2)
    )
    idx, d2, found, n_over = _overflow_lane(
        table, order, query, qmask, idx, d2, found, clm,
        jnp.float32(max_dist2), RB=RB, chunk=chunk, cap_over=cap_over,
    )
    return idx, d2, found, n_over > cap_over, oob


def cell_list_spec(points, max_dist, headroom=1.5,
                   margin_cells=4, max_cells=64_000_000,
                   vmem_budget=12_000_000, queries=None,
                   model_sets=None, pairs=None):
    """Host-side sizing for the device cell list: grid origin/dims over
    the cloud bbox (+margin for pose drift) and the static RB from the
    observed per-chunk candidate range lengths.

    Tries all 3 cyclic AXIS PERMUTATIONS x chunk sizes 256/128/64 and
    returns the smallest-RB configuration that fits the VMEM budget:
    dict(origin, dims, RB, chunk, perm), or None when nothing fits (the
    driver then stays on the brute engine).  The permutation matters
    because candidate-range length is driven by fast-axis COLUMN
    occupancy: a city cloud's dense ground plane makes z-fastest
    columns huge (every z crosses the ground), while vertical-fastest
    columns stay at ground+facade thickness — measured: spec declines
    outright at z-fastest on the bremen-regime clouds, RB ~10x smaller
    with the vertical axis fastest.  Distances are permutation-
    invariant, so consumers just bin/store coordinates permuted
    (build_cell_list_model / cell_list_plan_device)."""
    pts_all = np.asarray(points, np.float64)
    cell = float(max_dist)
    best = None
    if model_sets is None:
        model_sets = [pts_all]
    if pairs is None:
        if queries is None:
            pairs = [(mi, None) for mi in range(len(model_sets))]
        else:
            pairs = [
                (mi, qi)
                for mi in range(len(model_sets))
                for qi in range(len(queries))
            ]
    for perm in ((0, 1, 2), (2, 0, 1), (1, 2, 0)):
        pts = pts_all[:, perm]
        lo = pts.min(0) - margin_cells * cell
        hi = pts.max(0) + margin_cells * cell
        dims = tuple(
            int(np.ceil((hi[i] - lo[i]) / cell)) + 1 for i in range(3)
        )
        if dims[0] * dims[1] * dims[2] > max_cells:
            continue
        nx, ny, nz = dims
        C = nx * ny * nz

        def to_ids(cloud):
            ij = np.clip(
                np.floor(
                    (np.asarray(cloud, np.float64)[:, perm] - lo) / cell
                ).astype(np.int64),
                0, np.asarray(dims) - 1,
            )
            return np.sort((ij[:, 0] * ny + ij[:, 1]) * nz + ij[:, 2])

        starts = [
            np.searchsorted(to_ids(ms), np.arange(C + 1))
            for ms in model_sets
        ]
        qid_sets = (
            None if queries is None else [to_ids(qp) for qp in queries]
        )
        offs = [
            (dx * ny + dy) * nz for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ]
        # chunk is the kernel's query-tile LANE count: must be a
        # multiple of 128 (Mosaic block constraint)
        for chunk in (256, 128):
            # Per-chunk candidate-range requirements against the ACTUAL
            # model sets (per-scan models for window-1 / per-link
            # matching — the union overestimates by the overlap factor
            # and declines on dense city clouds).  RB is sized at the
            # p99.5 requirement x headroom: the rare chunks that
            # straddle slow-axis row transitions (measured: p50 ~0,
            # p99 ~1k, max ~10x that on city clouds) are repaired
            # exactly by the kernel's brute overflow lane, provided
            # their query count stays within its cap.
            per_pair_reqs = []
            for (mi, qi) in pairs:
                cell_start = starts[mi]
                ids_q = (
                    qid_sets[qi] if qi is not None and qid_sets
                    else to_ids(model_sets[mi])
                )
                W = _cdiv(len(ids_q), chunk)
                pad = W * chunk - len(ids_q)
                idc = np.pad(ids_q, (0, pad), constant_values=C).reshape(
                    W, chunk
                )
                lo_id = idc[:, 0]
                hi_id = np.where(
                    idc[:, -1] < C, idc[:, -1],
                    idc[np.arange(W), np.maximum(
                        (idc < C).sum(1) - 1, 0
                    )],
                )
                req = np.zeros(W, np.int64)
                for off in offs:
                    s = cell_start[np.clip(lo_id + off - 1, 0, C)]
                    e = cell_start[np.clip(hi_id + off + 2, 0, C)]
                    ln = np.maximum(e - s, 0) + (s - (s // 128) * 128)
                    req = np.maximum(req, ln)
                per_pair_reqs.append(req)
            all_req = np.concatenate(per_pair_reqs)
            if len(all_req) == 0:
                continue
            # the overflow lane repairs both the structural tail AND
            # pose-drift occupancy growth, so headroom beyond ~1.3x
            # only wastes VMEM; RB is further clamped to the VMEM
            # budget and the residual tail must fit the lane
            rb = max(128, int(np.percentile(all_req, 99.0)))
            RB = _round_up(int(rb * min(headroom, 1.3)), 128)
            # kernel working set: one [chunk, RB] score (+1 temp) and
            # the [8, 9RB] DMA scratch — the per-range streaming form
            rb_limit = (
                vmem_budget // (8 * chunk + 9 * 32) // 128
            ) * 128
            RB = max(128, min(RB, rb_limit))
            # worst single invocation's flagged queries must fit the
            # kernel's brute overflow lane (cap_over, default 8192)
            over_q = max(
                int((req > RB).sum()) * chunk for req in per_pair_reqs
            )
            if over_q > 24576:
                continue
            # lane capacity: 3x the worst estimated overflow (pose
            # drift can grow it), floor 8192
            cap_over = int(_round_up(max(8192, 3 * over_q), 4096))
            cand = dict(
                origin=lo.astype(np.float32), dims=dims, RB=int(RB),
                chunk=int(chunk), perm=perm, cap_over=cap_over,
            )
            if best is None or cand["RB"] < best["RB"]:
                best = cand
            break  # larger chunks are better at equal feasibility
    return best


# ---------------------------------------------------------------------------
# MXU brute-force NN kernel — the in-loop production NN
# ---------------------------------------------------------------------------
#
# Honest in-loop measurements (round 3) showed both XLA NN engines
# collapse inside lax.while_loop: the hashed-cell-list candidate gather
# lowers to a ~265 M elem/s serial gather, and the brute matmul+argmin
# loses its fusion so the [Q, M] distance matrix spills to HBM
# (~16 ms/iter at dat scale vs ~0.3 ms standalone).  The reference hits
# the same wall differently: its kd-tree recursion is pointer chasing
# the TPU cannot express at all (include/slam6d/kdTreeImpl.h:345).
#
# This kernel computes the distance block [TQ, TM] on the MXU from
# transposed [8, N] coordinate tiles and keeps the running (min, argmin)
# in VMEM scratch across model tiles — nothing ever spills, in or out
# of a while_loop.  Points are pre-centered by the caller (matmul
# expansion precision, same contract as ops.nn.nn_brute) and the
# winner's distance is recomputed exactly by direct subtraction.

def _nn_mxu_kernel(q_ref, m_ref, idx_ref, d2_ref, best_d2, best_ix, *, TM,
                   precise):
    wm = pl.program_id(1)
    nm = pl.num_programs(1)

    @pl.when(wm == 0)
    def _init():
        best_d2[...] = jnp.full_like(best_d2, 3.4e38)
        best_ix[...] = jnp.zeros_like(best_ix)

    q = q_ref[...]  # [8, TQ] rows 0-2 = xyz (centered), rest 0
    m = m_ref[...]  # [8, TM]
    cross = _cross_rank(q, m, precise=precise)  # [TQ, TM]
    m2 = jnp.sum(m * m, axis=0, keepdims=True)  # [1, TM]
    score = m2 - 2.0 * cross  # d2 - |q|2: same argmin
    bm = jnp.min(score, axis=1, keepdims=True).T        # [1, TQ]
    ba = jax.lax.argmin(score, 1, jnp.int32)            # [TQ]
    ba = ba[None, :] + wm * np.int32(TM)                # [1, TQ]
    prev = best_d2[0:1, :]
    better = bm < prev
    best_d2[0:1, :] = jnp.where(better, bm, prev)
    best_ix[0:1, :] = jnp.where(better, ba, best_ix[0:1, :])

    @pl.when(wm == nm - 1)
    def _emit():
        d2_ref[...] = jnp.broadcast_to(best_d2[0:1, :], d2_ref.shape)
        idx_ref[...] = jnp.broadcast_to(best_ix[0:1, :], idx_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("TQ", "TM", "interpret", "precise")
)
def _nn_mxu_call(qT, mT, TQ, TM, interpret=False, precise=False):
    """qT: [8, Qpad] centered transposed queries; mT: [8, Mpad] centered
    transposed model (masked/pad columns pushed far away).  Returns
    (idx [Qpad] i32 into the padded model, score [Qpad] f32)."""
    Qpad, Mpad = qT.shape[1], mT.shape[1]
    NQ, NM = Qpad // TQ, Mpad // TM
    kern = functools.partial(_nn_mxu_kernel, TM=TM, precise=precise)
    idx8, d28 = pl.pallas_call(
        kern,
        grid=(NQ, NM),
        in_specs=[
            # wq - wq keeps the index i32 (a literal 0 lowers to i64
            # in the remote Mosaic pipeline and fails legalization)
            pl.BlockSpec((8, TQ), lambda wq, wm: (wq - wq, wq)),
            pl.BlockSpec((8, TM), lambda wq, wm: (wq - wq, wm)),
        ],
        out_specs=[
            pl.BlockSpec((8, TQ), lambda wq, wm: (wq - wq, wq)),
            pl.BlockSpec((8, TQ), lambda wq, wm: (wq - wq, wq)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Qpad), jnp.int32),
            jax.ShapeDtypeStruct((8, Qpad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, TQ), jnp.float32),
            pltpu.VMEM((8, TQ), jnp.int32),
        ],
        interpret=interpret,
    )(qT, mT)
    return idx8[0], d28[0]


def nn_brute_mxu(
    query, qmask, model, mmask, max_dist2, TQ: int = 256, TM: int = 4096,
    precise: bool = False,
):
    """NN with the contract of ops.nn.nn_brute (strict d2 < max_dist2,
    centered ranking + exact winner recompute), through the Pallas MXU
    kernel.  Fully traceable — safe inside jit/while_loop; interpret
    mode runs it on CPU backends (tests).

    Ranking precision: default is the 3-pass split ranking
    (see _cross_rank — rank error ≤ ~1.2e-5 · centered-extent², i.e.
    candidates closer than that bound may swap; accept distances stay
    exact).  Pass precise=True for exact-f32 (6-pass) ranking when the
    centered cloud extent approaches 300·max_dist (the point where the
    bound reaches ~10% of the match gate)."""
    Q = query.shape[0]
    M = model.shape[0]
    center = jnp.sum(
        jnp.where(mmask[:, None], model, 0.0), axis=0
    ) / jnp.maximum(jnp.sum(mmask), 1)
    Qpad = _round_up(max(Q, TQ), TQ)
    Mpad = _round_up(max(M, TM), TM)
    qc = query - center
    qT = jnp.zeros((8, Qpad), jnp.float32)
    qT = qT.at[:3, :Q].set(qc.T)
    # masked + pad model columns sit at a sentinel derived from the
    # data's actual centered extent (10x the combined model+query
    # extent): its score 3s² − 2q·(s,s,s) then always exceeds any real
    # candidate's, for multi-km clouds too (a fixed 1e6 sentinel loses
    # once coordinates approach it and would silently drop valid pairs).
    mcen = jnp.where(mmask[:, None], model - center, 0.0)
    ext = jnp.maximum(
        jnp.max(jnp.abs(mcen)),
        jnp.max(jnp.abs(jnp.where(qmask[:, None], qc, 0.0))),
    )
    sentinel = 10.0 * ext + jnp.float32(1e3)
    mc = jnp.where(mmask[:, None], model - center, sentinel)
    mT = jnp.full((8, Mpad), jnp.float32(0.0))
    mT = mT.at[:3, :M].set(mc.T)
    mT = mT.at[:3, M:].set(sentinel)
    interpret = jax.default_backend() != "tpu"
    idx, _score = _nn_mxu_call(
        qT, mT, TQ, TM, interpret=interpret, precise=precise
    )
    idx = jnp.clip(idx[:Q], 0, M - 1)
    diff = query - model[idx]
    best = jnp.sum(diff * diff, axis=1)
    big = jnp.float32(3.4e38)
    best = jnp.where(mmask[idx], best, big)
    found = qmask & (best < max_dist2)
    return idx, best, found
