from .sharding import ShardedEqlbEngine  # noqa: F401
