from . import icp_shard, lum_shard, mesh  # noqa: F401
