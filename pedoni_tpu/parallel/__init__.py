from .spatial import ShardedConfig, make_sharded_step, make_sharded_initial_state, dryrun

__all__ = [
    "ShardedConfig",
    "make_sharded_step",
    "make_sharded_initial_state",
    "dryrun",
]
