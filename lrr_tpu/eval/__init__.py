from lrr_tpu.eval.repeatability import feature_repeatability
from lrr_tpu.eval.indexing_eval import evaluate_indexing
from lrr_tpu.eval.compare import compare_descriptor_sets

__all__ = [
    "feature_repeatability",
    "evaluate_indexing",
    "compare_descriptor_sets",
]
