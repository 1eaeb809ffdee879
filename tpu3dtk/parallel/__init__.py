from . import icp_shard, mesh  # noqa: F401
