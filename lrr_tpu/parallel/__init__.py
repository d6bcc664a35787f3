from lrr_tpu.parallel.sharding import (
    distributed_normal_equations,
    make_mesh,
    shard_candidates,
)
from lrr_tpu.parallel.spatial import (
    halo_exchange,
    score_halo,
    sharded_feature_score,
)

__all__ = [
    "distributed_normal_equations",
    "halo_exchange",
    "make_mesh",
    "score_halo",
    "shard_candidates",
    "sharded_feature_score",
]
