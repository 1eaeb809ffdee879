"""Multi-host (DCN) execution skeleton — SURVEY §2.8 "Distributed
communication backend".

The reference has NO multi-node path at all (its only cross-process
channel is the scanserver's shared memory, include/scanserver/
clientInterface.h:15-84); this layer introduces the axis the TPU
design demands: a ``hosts`` mesh dimension riding DCN on top of the
per-host ``points``/``scans`` axes riding ICI.

Model:

- Every host runs the same program and calls :func:`initialize` first
  (jax.distributed handshake; coordinator = process 0).
- Scan INGEST is host-sharded: each host reads only its contiguous
  range of the sequence (:func:`host_scan_range`) — the multi-host
  replacement for the scanserver's out-of-core cache role (the cache
  budget becomes per-host RAM, see io.cache).
- Global arrays are assembled with
  ``jax.make_array_from_process_local_data`` under a mesh from
  :func:`host_device_mesh` whose leading ``hosts`` axis maps one row
  per host, so cross-host collectives (the LUM G/B psum, ICP pair-stat
  psums) traverse DCN exactly once per iteration while everything else
  stays on ICI.

Launch recipe (4 hosts):

    # on every host h = 0..3:
    JAX_COORDINATOR=host0:8476 NPROC=4 PROC_ID=$h python my_slam.py

    # my_slam.py
    from tpu3dtk.parallel import distributed as dist
    dist.initialize()                       # reads the env vars above
    mesh = dist.host_device_mesh(("hosts", "points"))
    lo, hi = dist.host_scan_range(n_scans)  # this host's ingest range
    ...

Single-host usage degrades gracefully: ``initialize()`` is a no-op
when NPROC is unset/1, and ``host_device_mesh`` returns a (1, n)
mesh over local devices.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = [
    "initialize",
    "is_distributed",
    "host_scan_range",
    "host_device_mesh",
    "global_scan_array",
]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join the multi-host job (jax.distributed.initialize wrapper).

    Arguments default to the env vars JAX_COORDINATOR / NPROC /
    PROC_ID.  Returns True when running distributed, False for the
    single-host no-op.  Safe to call more than once.
    """
    num_processes = num_processes or int(os.environ.get("NPROC", "1"))
    if num_processes <= 1:
        return False
    if jax.process_count() > 1:  # already initialized
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR", "localhost:8476"
    )
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("PROC_ID", "0"))
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_distributed() -> bool:
    return jax.process_count() > 1


def host_scan_range(n_scans: int, n_hosts: int | None = None,
                    host_id: int | None = None) -> tuple[int, int]:
    """This host's contiguous ingest range [lo, hi) of the scan
    sequence (hosts own scan ranges; the DCN-era scanserver role)."""
    n_hosts = n_hosts or jax.process_count()
    host_id = host_id if host_id is not None else jax.process_index()
    per = -(-n_scans // n_hosts)
    lo = min(host_id * per, n_scans)
    return lo, min(lo + per, n_scans)


def host_device_mesh(
    axes: tuple[str, str] = ("hosts", "points"),
    devices=None,
) -> Mesh:
    """2-D mesh [n_hosts, devices_per_host]: the leading axis groups
    each host's devices in one row, so collectives over it cross DCN
    and collectives over the trailing axis stay on ICI.

    With ``devices`` given (testing), the same shape logic applies to
    that flat device list using NPROC (or 1) as the host count —
    this is how the driver's virtual-CPU dryrun simulates a 2x4
    hosts-x-devices layout on one machine.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n_hosts = jax.process_count()
    if devices is not None:
        n_hosts = int(os.environ.get("DRYRUN_HOSTS", "0")) or n_hosts
    if len(devs) % max(n_hosts, 1):
        n_hosts = 1
    arr = np.array(devs).reshape(max(n_hosts, 1), -1)
    return Mesh(arr, axes)


def global_scan_array(mesh: Mesh, local_block: np.ndarray, axis: int = 0):
    """Assemble a globally-sharded array from each host's local scan
    block (jax.make_array_from_process_local_data): dimension ``axis``
    is sharded over the ``hosts`` mesh axis, the rest replicated.
    Single-host: a plain device_put."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = [None] * local_block.ndim
    spec[axis] = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(*spec))
    if jax.process_count() == 1:
        return jax.device_put(local_block, sharding)
    return jax.make_array_from_process_local_data(
        sharding, local_block
    )
