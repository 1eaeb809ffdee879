"""Multi-device GraphSLAM: graph-link covariance assembly sharded over
the device mesh.

The reference parallelizes LUM's per-link covariance loop with OpenMP
threads scattering into shared G/B under a critical section
(lum6Deuler.cc:270-301, SURVEY §2.8 item 2).  Here the links — each an
independent NN search + 6x6 reduction — are data-parallel across
devices via shard_map; every device runs the batched link kernel on its
shard against the replicated point tensor, and results are gathered for
the (tiny, host-side) sparse assembly.  This is the dominant phase of
hannover2-class workloads (the BASELINE north-star's allreduce plan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..models.graphslam import _one_link_stats

__all__ = ["link_covariances_sharded"]


def link_covariances_sharded(
    mesh,
    points_g,
    masks,
    links,
    max_dist2: float,
    axis: str = "points",
    chunk: int = 4,
):
    """Batched (C, CD, m) for all links, links sharded over ``axis``.

    points_g: [S, N, 3] replicated; links: [L, 2] (L padded to the axis
    size internally; padding links are (0, 0) and their outputs are
    dropped).  Returns numpy (C [L,6,6], CD [L,6], m [L]).
    """
    n_dev = mesh.devices.size
    L = len(links)
    Lpad = ((L + n_dev - 1) // n_dev) * n_dev
    links_p = np.zeros((Lpad, 2), np.int32)
    links_p[:L] = np.asarray(links, np.int32)

    md2 = jnp.float32(max_dist2)

    def shard_fn(pts, msk, lnk):
        def one(link):
            return _one_link_stats(
                pts[link[0]], msk[link[0]], pts[link[1]], msk[link[1]], md2
            )

        return jax.lax.map(one, lnk, batch_size=min(chunk, max(1, lnk.shape[0])))

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None)),
        out_specs=(P(axis, None, None), P(axis, None), P(axis)),
        check_vma=False,
    )
    C, CD, m = jax.jit(fn)(
        jnp.asarray(points_g, jnp.float32),
        jnp.asarray(masks),
        jnp.asarray(links_p),
    )
    return np.asarray(C)[:L], np.asarray(CD)[:L], np.asarray(m)[:L]
