"""tpu3dtk — a TPU-native 6D-SLAM / point-cloud framework.

A from-scratch re-design of the capabilities of 3DTK ("The 3D Toolkit",
reference at /root/reference) for TPU hardware: JAX/XLA for the compute
graph, Pallas for hot kernels, jax.sharding/shard_map for multi-chip
scaling.  This is the package the task brief calls ``3dtk_tpu/``; the
import name is ``tpu3dtk`` because Python identifiers cannot begin with a
digit.  Layout follows SURVEY.md §7:

- ``core``      math & scan abstractions   (ref: include/slam6d/globals.icc, scan.h)
- ``io``        scan/pose/frames I/O       (ref: src/scanio/)
- ``ops``       device kernels: reduction, NN search, transforms, normals
- ``models``    registration algorithms: ICP, minimizers, GraphSLAM, ELCH
- ``parallel``  mesh/sharding layer (no analog in the reference: it is single-node)
- ``utils``     metrics, config
- ``cli``       drivers mirroring the reference binaries (slam6D, scan_red, ...)

Dtype policy: f64 is enabled globally so host-side pose math matches the
reference's double precision; all hot device kernels request f32/bf16
explicitly (TPUs have no native f64).
"""

import os as _os

from jax import config as _config

_config.update("jax_enable_x64", True)

# Matmul precision: TPU MXUs run f32 matmuls as bf16 passes by default;
# with cm-scale scan coordinates (±500 after centering) a single bf16
# pass corrupts d² by ~10³ cm² — larger than the 625 cm² ICP match gate
# — so NN ranking picks the wrong neighbor for ~37% of queries (measured
# on v5e) and pair-statistic einsums drift.  "highest" (6-pass) restores
# exact-f32 ranking at 1.6-1.7x the matmul time of the default — the NN
# cross matmul is latency/bandwidth-bound at k=8, not FLOPs-bound.
# Override via TPU3DTK_MATMUL_PRECISION if a workload can tolerate less.
_config.update(
    "jax_default_matmul_precision",
    _os.environ.get("TPU3DTK_MATMUL_PRECISION", "highest"),
)

# Persistent XLA compilation cache: one-shot CLI runs pay tens of
# seconds of compiles for the jitted registration programs; caching
# them across processes makes every run after the first fast (verified
# to work through the remote-device tunnel).  Set TPU3DTK_XLA_CACHE=""
# to disable, or point it at a different directory.
_cache_dir = _os.environ.get(
    "TPU3DTK_XLA_CACHE",
    _os.path.join(
        _os.path.expanduser("~"), ".cache", "tpu3dtk", "xla",
        # per-platform subdir: entries compiled by the tunnel-side
        # toolchain carry machine features local CPU runs must not load
        _os.environ.get("TPU3DTK_PLATFORM", "default"),
    ),
)
if _cache_dir:
    _config.update("jax_compilation_cache_dir", _cache_dir)
    _config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from . import core, io, ops, models, parallel, utils  # noqa: E402,F401

__version__ = "0.1.0"
