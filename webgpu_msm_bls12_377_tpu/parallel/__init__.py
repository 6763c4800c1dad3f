"""Multi-chip execution: mesh construction and the sharded MSM engine."""

from .mesh import ShardedMsmEngine, make_mesh  # noqa: F401
