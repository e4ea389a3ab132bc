from .sharding import (
    make_render_mesh,
    shard_views,
    replicate,
    make_sharded_ham_step,
    make_sharded_nr_step,
)

__all__ = [
    "make_render_mesh",
    "shard_views",
    "replicate",
    "make_sharded_ham_step",
    "make_sharded_nr_step",
]
