from lrr_tpu.parallel.sharding import (
    distributed_normal_equations,
    make_mesh,
    shard_candidates,
)

__all__ = ["distributed_normal_equations", "make_mesh", "shard_candidates"]
