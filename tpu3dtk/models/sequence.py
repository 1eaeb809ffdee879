"""Sequential registration driver — the TPU-native ``icp6D::doICP``
(ref src/slam6d/icp6D.cc:374-437) over a scan sequence, with odometry
extrapolation (``Scan::mergeCoordinatesWithRoboterPosition``,
scan.cc:826-833) and metascan mode (MetaScan union of previously
registered scans, include/slam6d/metaScan.h:41-71).

Host orchestration is a thin Python loop; all heavy work is the jitted
:func:`tpu3dtk.models.icp.icp_pair`.  Shapes are bucketed: every scan's
reduced points are padded to one sequence-wide cap so each (model_cap,
target_cap) pair compiles exactly once.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..core import math3d
from ..core.scan import TPUScan
from ..io.frames import AlgoType
from . import icp as icp_mod

__all__ = ["SequenceRegistration", "register_sequence"]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _bucket_cap(n: int, base: int) -> int:
    """Round up to a power-of-two multiple of base: bounds the number of
    distinct compiled shapes to O(log(total points)) over a whole
    sequence (SURVEY §7 'hard parts' #3 — metascan model sizes grow per
    scan; without bucketing every pair recompiles)."""
    cap = base
    while cap < n:
        cap *= 2
    return cap


@dataclasses.dataclass
class SequenceRegistration:
    """Registration run over an ordered scan list."""

    params: icp_mod.IcpParams = dataclasses.field(default_factory=icp_mod.IcpParams)
    metascan: bool = False  # ref --metascan
    max_num_metascans: int = 0  # keep only last n scans in the meta model
    extrapolate_odometry: bool = True  # ref -e / eP flag (default on)
    pad_multiple: int = 512
    # NN engine: "auto" = hashed cell list for large models, brute
    # otherwise; "brute" | "grid" force one (ref -t nns_type switch,
    # include/slam6d/scan.h:34-36).
    nns: str = "auto"
    grid_min_model: int = 4096  # auto threshold: grid above this M
    grid_max_cap: int = 768  # fall back to brute beyond this occupancy
    # Multi-device: "auto" shards target points over all local devices
    # (psum-merged pair stats, parallel.icp_shard) whenever more than
    # one device is present; None forces single-device jit.  A
    # jax.sharding.Mesh may be passed explicitly.
    mesh: object = "auto"

    def _resolve_mesh(self):
        if self.mesh == "auto":
            from ..parallel.mesh import default_points_mesh

            return default_points_mesh()
        return self.mesh or None

    def run(self, scans: list[TPUScan]) -> list[dict]:
        """Register scans sequentially.  Mutates scan poses and frames.
        Returns per-match info dicts."""
        if not scans:
            return []
        return [self.run_single(scans, i) for i in range(1, len(scans))]

    def run_single(self, scans: list[TPUScan], i: int) -> dict:
        """Register scan i against the previous scan (or metascan of all
        earlier scans): odometry extrapolation + one jitted ICP match +
        frames bookkeeping (the loop body of doICP, icp6D.cc:383-437).

        Frame bookkeeping mirrors reference transform(islum=0): every
        match event appends a frame to every scan (ICP for current,
        ICPINACTIVE for already-registered, INVALID for future scans).
        """
        mesh = self._resolve_mesh()
        pad_to = self.pad_multiple
        if mesh is not None:
            pad_to = _round_up(pad_to, mesh.devices.size)
        cap = _round_up(max(len(s.reduced_local()) for s in scans), pad_to)
        cur = scans[i]
        prev = scans[i - 1]
        if self.extrapolate_odometry:
            # deltaMat = prev.transMat @ inv(prev.transMatOrg)
            delta = prev.transMat @ np.asarray(
                math3d.m4inv(prev.transMatOrg)
            )
            cur.transform(delta, AlgoType.INVALID, record=False)

        if self.metascan:
            lo = 0
            if self.max_num_metascans > 0:
                lo = max(0, i - self.max_num_metascans)
            model_scans = scans[lo:i]
        else:
            model_scans = [prev]

        n_model = sum(len(ms.reduced_local()) for ms in model_scans)
        mcap = _bucket_cap(n_model, self.pad_multiple)
        model_pts = np.zeros((mcap, 3), dtype=np.float32)
        model_mask = np.zeros(mcap, dtype=bool)
        o = 0
        for ms in model_scans:
            g = np.asarray(
                math3d.transform3(ms.transMat, ms.reduced_local())
            )
            model_pts[o : o + len(g)] = g
            model_mask[o : o + len(g)] = True
            o += len(g)

        tgt_pts, tgt_mask = cur.reduced_padded(cap)
        need_normals = (
            self.params.pairing != "closest_point"
            or self.params.minimizer == "napx"
        )
        tgt_normals = cur.reduced_normals_padded(cap) if need_normals else None
        grid_buckets = grid_cap = 0
        use_grid = self.nns == "grid" or (
            self.nns == "auto" and n_model >= self.grid_min_model
        )
        if use_grid and self.params.pairing != "along_normal":
            from ..ops import nn as nn_ops

            max_dist = float(np.sqrt(self.params.max_dist_match2))
            H, bcap = nn_ops.cell_hash_spec(
                model_pts[:o], np.ones(o, bool), max_dist
            )
            if bcap <= self.grid_max_cap:
                grid_buckets, grid_cap = H, bcap
        kwargs = dict(
            max_dist_match2=self.params.max_dist_match2,
            epsilon=self.params.epsilon,
            max_iterations=self.params.max_iterations,
            minimizer=self.params.minimizer,
            subsample=self.params.subsample,
            seed=i,
            pairing=self.params.pairing,
            target_normals_local=tgt_normals,
            grid_buckets=grid_buckets,
            grid_bucket_cap=grid_cap,
        )
        T0 = cur.transMat.astype(np.float32)
        from ..utils.metrics import MATCHING, metrics

        with metrics.time(MATCHING):
            if mesh is not None:
                from ..parallel import icp_shard

                res = icp_shard.icp_pair_sharded(
                    mesh, model_pts, model_mask, tgt_pts, tgt_mask, T0, **kwargs
                )
            else:
                res = icp_mod.icp_pair(
                    model_pts, model_mask, tgt_pts, tgt_mask, T0, **kwargs
                )
            res = icp_mod.IcpResult(*jax.tree_util.tree_map(np.asarray, res))
        T_new = np.asarray(res.T, dtype=np.float64)
        # orthonormalize the accumulated f32 rotation before storing
        R = T_new[:3, :3]
        u, _, vt = np.linalg.svd(R)
        T_new[:3, :3] = u @ vt
        cur.set_pose(T_new, AlgoType.ICP)
        for j, other in enumerate(scans):
            if other is cur:
                continue
            other.add_frame(
                AlgoType.ICPINACTIVE if j < i else AlgoType.INVALID
            )
        return {
            "identifier": cur.identifier,
            "iterations": int(res.iterations),
            "error": float(res.error),
            "pairs": int(res.n_pairs),
        }


def register_sequence(scans: list[TPUScan], **kwargs) -> list[dict]:
    params_keys = icp_mod.IcpParams._fields
    params = icp_mod.IcpParams(
        **{k: v for k, v in kwargs.items() if k in params_keys}
    )
    driver_kwargs = {k: v for k, v in kwargs.items() if k not in params_keys}
    return SequenceRegistration(params=params, **driver_kwargs).run(scans)
