from lrr_tpu.matching.indexing import (
    CandidateSet,
    generate_candidates,
    initial_transforms,
)

__all__ = ["CandidateSet", "generate_candidates", "initial_transforms"]
