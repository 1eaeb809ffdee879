"""ICP matching engine — the TPU-native ``icp6D`` (ref
src/slam6d/icp6D.cc:104-285).

Design (not a port): the reference's hot loop is a per-point kd-tree
recursion inside an OpenMP region; here one jitted ``lax.while_loop``
fuses, per iteration:

  1. transform target points by the current pose (ref transformReduced,
     scan.cc:851-873 — but we keep local points immutable and compose
     the pose instead of mutating point storage),
  2. batched NN search against the model points (ops.nn),
  3. masked centered pair statistics (ref icp6D.cc:144-191),
  4. a closed-form minimizer (models.minimizers),
  5. pose update T <- align @ T (ref transformMatrix, scan.cc:878-898),
  6. the two-delta convergence test
     |err - prev| < eps and |err - prevprev| < eps (ref icp6D.cc:266-279).

Pairing semantics match ``SearchTree::getPtPairs``
(src/slam6d/searchTree.cc:91-188): model points live in the model's
current global frame, target (data) points in the target's current
estimate; matches beyond max_dist_match2 are rejected (strict <).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math3d
from ..ops import nn as nn_ops
from . import minimizers as mz

__all__ = ["IcpParams", "IcpResult", "icp_pair", "icp_step"]


class IcpParams(NamedTuple):
    max_dist_match2: float = 625.0  # -d 25 -> 25^2 (cm^2)
    max_iterations: int = 50  # -i
    epsilon: float = 1e-5  # --epsICP
    minimizer: str = "quat"  # -a
    subsample: int = 1  # rnd: take ~1/rnd of target points per iteration
    pairing: str = "closest_point"  # ref PairingMode (pairingMode.h):
    # "closest_point" | "closest_plane" (point-to-plane projection) |
    # "along_normal" (normal shooting)


class IcpResult(NamedTuple):
    T: jnp.ndarray  # [4,4] final pose of the target scan (global)
    error: jnp.ndarray  # final RMS point-to-point error
    iterations: jnp.ndarray  # iterations executed
    n_pairs: jnp.ndarray  # pairs in last iteration


def _find_pairs(
    model, mmask, tgt_global, tmask, max_dist2, pairing="closest_point",
    tgt_normals=None, grid=None,
):  # noqa: D401 — see docstring below
    """Correspondence search for one iteration: returns matched model
    points [N,3] (projected per pairing mode) and the accept mask [N].

    Pairing semantics follow SearchTree::getPtPairs
    (searchTree.cc:126-163): for "closest_plane" the matched model point
    is projected onto the plane through the target point with the
    *target's* normal (s' = (n·(s−t))n + t); for "along_normal" the NN
    metric is perpendicular distance to the target's normal ray.

    When ``grid`` (a prebuilt :class:`ops.nn.CellHash`) is given, the
    closest-point search runs through the sublinear hashed cell-list
    kernel instead of brute force (the reference's kd-tree role,
    include/slam6d/kdTreeImpl.h:345).
    """
    if pairing == "along_normal":
        idx, d2, found = nn_ops.nn_brute_line(
            tgt_global, tgt_normals, tmask, model, mmask, max_dist2
        )
    elif grid is not None:
        ghash, bucket_cap = grid
        idx, d2, found = nn_ops.nn_cell_hash(
            tgt_global, tmask, ghash, max_dist2, bucket_cap
        )
    else:
        idx, d2, found = nn_ops.nn_brute(
            tgt_global, tmask, model, mmask, max_dist2
        )
    m_pts = model[idx]
    if pairing == "closest_plane":
        dot = jnp.sum(tgt_normals * (m_pts - tgt_global), axis=1, keepdims=True)
        m_pts = tgt_global + dot * tgt_normals
    return m_pts, found


def _pair_statistics(
    model, mmask, tgt_global, tmask, max_dist2, pairing="closest_point",
    tgt_normals=None, grid=None, axis_name=None,
):
    m_pts, found = _find_pairs(
        model, mmask, tgt_global, tmask, max_dist2,
        pairing=pairing, tgt_normals=tgt_normals, grid=grid,
    )
    return mz.pair_stats(m_pts, tgt_global, found, axis_name=axis_name)


def _icp_pair_impl(
    model,
    mmask,
    target_local,
    tmask,
    T0,
    *,
    max_dist_match2,
    epsilon,
    max_iterations: int = 50,
    minimizer: str = "quat",
    subsample: int = 1,
    seed: int = 0,
    pairing: str = "closest_point",
    target_normals_local=None,
    grid_buckets: int = 0,
    grid_bucket_cap: int = 0,
    axis_name: str | None = None,
) -> IcpResult:
    """Match one target scan against fixed model points.

    ``axis_name``: when traced inside shard_map with the target points
    sharded over a mesh axis (model replicated), pair statistics are
    psum-merged over it each iteration — the multi-device parallel ICP
    (see parallel.icp_shard.icp_pair_sharded).

    model: [M,3] f32 model points in global frame; target_local: [N,3]
    f32 target points in the target's **local** frame; T0: [4,4] initial
    global pose of the target (transMatOrg composed with odometry
    extrapolation, ref scan.cc:826-833).

    subsample = the reference's ``rnd`` (-R): each iteration uses a
    fresh ~1/subsample random subset of target points
    (searchTree.cc:54-55 ``rand(rnd) != 0 -> skip``).

    grid_buckets/grid_bucket_cap > 0 routes the closest-point search
    through the hashed cell list (ops.nn.nn_cell_hash): the model is
    fixed across iterations, so the hash is built ONCE per match and
    every ``lax.while_loop`` iteration pays O(Q·27·cap) instead of
    O(Q·M) — the role the kd-tree build plays in the reference
    (BasicScan::createSearchTreePrivate, basicScan.cc:702-728).  Size
    the statics with ops.nn.cell_hash_spec on the host.
    """
    model = model.astype(jnp.float32)
    target_local = target_local.astype(jnp.float32)
    T0 = T0.astype(jnp.float32)
    if minimizer == "napx" and target_normals_local is None:
        raise ValueError("napx minimizer requires target normals")
    align_fn = mz.MINIMIZERS[minimizer]
    eps = jnp.float32(epsilon)
    key0 = jax.random.PRNGKey(seed)
    need_normals = pairing != "closest_point" or minimizer == "napx"

    if grid_buckets > 0 and pairing != "along_normal":
        inf3 = jnp.full((3,), jnp.float32(jnp.inf))
        origin = jnp.min(jnp.where(mmask[:, None], model, inf3), axis=0)
        origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
        cell = jnp.sqrt(jnp.float32(max_dist_match2))
        grid = (
            nn_ops.build_cell_hash(model, mmask, origin, cell, grid_buckets),
            grid_bucket_cap,
        )
    else:
        grid = None

    def cond(carry):
        T, ret, prev, prev2, it, done, npairs = carry
        return (~done) & (it < max_iterations)

    def body(carry):
        T, ret, prev, prev2, it, done, _ = carry
        if subsample > 1:
            k = jax.random.fold_in(key0, it)
            keep = (
                jax.random.randint(k, tmask.shape, 0, subsample) == 0
            )
            it_mask = tmask & keep
        else:
            it_mask = tmask
        tgt_global = math3d.transform3(T, target_local).astype(jnp.float32)
        if need_normals:
            normals_g = math3d.transform3normal(
                T, target_normals_local
            ).astype(jnp.float32)
        else:
            normals_g = None
        if minimizer == "napx":
            m_pts, found = _find_pairs(
                model, mmask, tgt_global, it_mask,
                jnp.float32(max_dist_match2),
                pairing=pairing, tgt_normals=normals_g, grid=grid,
            )
            nstats = mz.napx_stats(
                m_pts, tgt_global, normals_g, found, axis_name=axis_name
            )
            enough = nstats.n > 3
            align, err = align_fn(nstats)
            npairs = nstats.n
        else:
            stats = _pair_statistics(
                model, mmask, tgt_global, it_mask,
                jnp.float32(max_dist_match2),
                pairing=pairing, tgt_normals=normals_g, grid=grid,
                axis_name=axis_name,
            )
            enough = stats.n > 3
            if minimizer in ("lumeuler", "lumquat"):
                # ref icp6D.cc:242-245: algo 7/8 receive the current pose
                align, err = align_fn(stats, T)
            else:
                align, err = align_fn(stats)
            npairs = stats.n
        align = jnp.where(enough, align, jnp.eye(4, dtype=jnp.float32))
        T_new = align @ T
        prev2_new = prev
        prev_new = ret
        ret_new = jnp.where(enough, err, ret)
        conv = (jnp.abs(ret_new - prev_new) < eps) & (
            jnp.abs(ret_new - prev2_new) < eps
        )
        done_new = conv | ~enough
        return (T_new, ret_new, prev_new, prev2_new, it + 1, done_new, npairs)

    init = (
        T0,
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.int32(0),
        jnp.bool_(False),
        jnp.float32(0.0),
    )
    T, ret, prev, prev2, it, done, npairs = jax.lax.while_loop(cond, body, init)
    return IcpResult(T=T, error=ret, iterations=it, n_pairs=npairs)


icp_pair = jax.jit(
    _icp_pair_impl,
    static_argnames=(
        "max_iterations",
        "minimizer",
        "subsample",
        "pairing",
        "grid_buckets",
        "grid_bucket_cap",
        "axis_name",
    ),
)
icp_pair.__doc__ = _icp_pair_impl.__doc__


@functools.partial(jax.jit, static_argnames=("minimizer",))
def icp_step(model, mmask, target_local, tmask, T, max_dist_match2, *, minimizer="quat"):
    """One un-rolled ICP iteration (building block for the graft entry
    point and for schedulers that interleave steps across scan pairs)."""
    tgt_global = math3d.transform3(T, target_local).astype(jnp.float32)
    stats = _pair_statistics(
        model, mmask, tgt_global, tmask, jnp.float32(max_dist_match2)
    )
    align, err = mz.MINIMIZERS[minimizer](stats)
    ok = stats.n > 3
    align = jnp.where(ok, align, jnp.eye(4, dtype=jnp.float32))
    return align @ T, err, stats.n
