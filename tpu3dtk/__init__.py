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

from jax import config as _config

_config.update("jax_enable_x64", True)

from . import core, io, ops, models, parallel, utils  # noqa: E402,F401

__version__ = "0.1.0"
