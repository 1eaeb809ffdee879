"""Out-of-core sequential registration — scans stream from disk through
the byte-budgeted LRU cache (io.cache.ScanCache) instead of residing in
RAM, the role of the reference's scanserver (README.scanserver.md: a
3500 MB shared-memory cache serving sequences larger than RAM;
CacheManager::allocateCacheObject flushes LRU objects on miss,
src/scanserver/cache/cacheManager.cc:79-113).

Design: window-1 sequential matching only ever needs the previous
scan's reduced points and the current scan's — everything else is
dropped (and re-pageable through the cache).  Reduction runs inside the
prefetch workers, so the cache holds REDUCED clouds; raw file payloads
exist only transiently inside a worker.  Peak resident scan bytes are
therefore bounded by cache_bytes + a couple of in-flight scans,
independent of sequence length (asserted by tests/test_streaming.py).
"""

from __future__ import annotations

import os

import numpy as np

from ..core import math3d
from ..io.cache import ScanCache, prefetch_scans
from ..io.scandir import PointFilter, RawScan
from ..ops.reduction import reduce_scan as _reduce_scan
from . import icp as icp_mod

__all__ = ["register_streaming"]


def register_streaming(
    directory: str,
    format: str = "uos",
    params: "icp_mod.IcpParams | None" = None,
    point_filter: PointFilter | None = None,
    reduction: tuple[float, int] = (10.0, 1),
    cache_bytes: int = 256 << 20,
    frames_out: str | None = None,
    start: int = 0,
    end: int = -1,
    extrapolate: bool = True,
    cache: ScanCache | None = None,
) -> list[dict]:
    """Register a scan directory sequentially with bounded memory.

    Returns per-scan dicts {identifier, pose [4,4], error, iterations}.
    ``frames_out``: directory to write per-scan ``.frames`` files into
    (the checkpoint/viewer format, like tpuslam).
    """
    import jax.numpy as jnp

    params = params or icp_mod.IcpParams()
    voxel, nrpts = reduction

    def reduce_scan(raw: RawScan) -> RawScan:
        xyz = np.asarray(raw.channels["xyz"], np.float32)
        if voxel > 0:
            xyz = np.asarray(_reduce_scan(xyz, voxel, nrpts))
        return RawScan(
            identifier=raw.identifier,
            channels={"xyz": xyz},
            pose_pos=raw.pose_pos,
            pose_theta=raw.pose_theta,
            directory=raw.directory,
        )

    cache = cache if cache is not None else ScanCache(cache_bytes)
    results: list[dict] = []
    prev_red = None
    prev_pose = None
    prev_org = None
    if frames_out:
        os.makedirs(frames_out, exist_ok=True)

    for raw in prefetch_scans(
        directory, format=format, start=start, end=end,
        point_filter=point_filter, cache=cache, transform=reduce_scan,
    ):
        red = np.asarray(raw.channels["xyz"], np.float32)
        pose_org = np.asarray(
            math3d.euler_to_matrix4(raw.pose_pos, raw.pose_theta, xp=np)
        )
        if prev_red is None:
            pose = pose_org
            info = {"identifier": raw.identifier, "pose": pose,
                    "error": 0.0, "iterations": 0}
        else:
            if extrapolate:
                delta = prev_pose @ np.asarray(math3d.m4inv(prev_org))
                T0 = delta @ pose_org
            else:
                T0 = pose_org
            model_g = np.asarray(
                math3d.transform3(prev_pose, prev_red), np.float32
            )
            res = icp_mod.icp_pair(
                jnp.asarray(model_g), jnp.ones(len(model_g), bool),
                jnp.asarray(red), jnp.ones(len(red), bool),
                jnp.asarray(T0, jnp.float32),
                max_dist_match2=params.max_dist_match2,
                epsilon=params.epsilon,
                max_iterations=params.max_iterations,
                minimizer=params.minimizer,
                subsample=params.subsample,
            )
            packed = icp_mod.unpack_result(
                np.asarray(icp_mod.pack_result(res))
            )
            pose = np.asarray(packed.T, np.float64)
            u, _, vt = np.linalg.svd(pose[:3, :3])
            pose[:3, :3] = u @ vt
            info = {
                "identifier": raw.identifier, "pose": pose,
                "error": float(packed.error),
                "iterations": int(packed.iterations),
            }
        results.append(info)
        if frames_out:
            from ..io import frames as frames_io

            cm = np.asarray(math3d.to_colmajor16(pose, xp=np))
            with open(
                os.path.join(frames_out, f"scan{raw.identifier}.frames"),
                "w",
            ) as f:
                f.write(" ".join(f"{v:.9g}" for v in cm) + " 2\n")
        prev_red = red
        prev_pose = pose
        prev_org = pose_org
    return results
