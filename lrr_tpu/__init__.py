"""lrr_tpu — a TPU-native Location Registration & Recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of msofka/LRR
(Sofka & Stewart, "Location Registration and Recognition (LRR) for Serial
Analysis of Nodules in Lung CT Scans", Medical Image Analysis 14, 2010).

Pipeline (all stages jit-compiled, array-first, statically shaped):

  1. Feature extraction   — multi-scale 3D corner/tube/sheet features with
                            sub-voxel localization        (lrr_tpu.features)
  2. Keypoints+descriptors — 195-d oriented shape-context  (lrr_tpu.features,
                            lrr_tpu.ops.descriptors)
  3. Initialization       — descriptor nearest-neighbor indexing
                            (lrr_tpu.matching)
  4. Refinement           — robust symmetric feature-shape-aware affine ICP
                            (lrr_tpu.estimation)
  5. Verification         — SVM over 8 alignment-quality measurements
                            (lrr_tpu.verify)

Design notes vs the reference (C++/VXL/ITK/VTK, single process, CPU threads):
  * Feature sets are struct-of-arrays pytrees with validity masks, never
    pointer graphs (reference: cdcl/cdcl_feature.h:17).
  * Nearest-neighbor search is a dense Voronoi-index-volume gather built by
    jump flooding plus tiled brute-force top-k — no kd-trees (reference:
    rrl/rrl_estimation_ICP_matching_all.txx:494-571,
    features/itkKdTreeForThreading.h:40).
  * The robust IRLS estimation step is one fixed-shape XLA program under
    lax.while_loop, vmappable over candidates and shardable over devices;
    per-device partial 12x12 normal equations reduce with psum (reference:
    per-thread AtA/Atb partials, rrl_estimation_symmetric_ICP_matching_all
    .txx:774-877).
"""

__version__ = "0.1.0"

from lrr_tpu import config as config
from lrr_tpu import types as types
