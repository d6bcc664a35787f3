"""Configuration system.

The reference scatters its knobs across compile-time ``#define``s and magic
constants (rrl/itkLocationRegistration.h:107-110, ExtractKeypoints.cxx:71,
rrl_estimation_ICP_matching_all.txx:521, plus in-code literals).  Here every
knob is an explicit frozen dataclass, hashable so configs can be jit
static arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    """Stage-1 feature detection (features/itkFeatureImageFilter.txx)."""

    sigma: float = 1.0            # detection scale (txx:1127-1131)
    num_levels: int = 3           # pyramid levels built (txx:1119)
    used_levels: Tuple[int, ...] = (1, 2)  # levels actually processed (txx:1137)
    score_halfwidth: int = 1      # 3^3 neighborhood for the outer-product score (txx:335)
    contrast_radius_mm: float = 30.0  # local-contrast filter radius (ExtractFeatures.cxx:469)
    contrast_mad_k: float = 3.0   # threshold = median + k * MAD
    min_distance_mm: float = 2.0  # spatial sparsification (ExtractFeatures.cxx:486)
    max_features: int = 65536     # static capacity of the output set
    # per-level NMS candidate budget (top-K score voxels fed to NMS /
    # subvoxel / sparsify).  The reference has NO cap (it keeps every NMS
    # survivor); with a fixed-shape top-k the budget must exceed the final
    # capacity or large volumes bias toward the strongest structures.
    # None => 2 * max_features.
    max_candidates_per_level: Optional[int] = None
    resample_spacing_mm: float = 1.0  # isotropic resample (ExtractFeatures.cxx:257)

    @property
    def candidates_per_level(self) -> int:
        return self.max_candidates_per_level or 2 * self.max_features


@dataclasses.dataclass(frozen=True)
class KeypointConfig:
    """Stage-1 keypoint extraction (features/ExtractKeypoints.cxx)."""

    min_distance_mm: float = 6.0  # (:239)
    max_keypoints: int = 4096


@dataclasses.dataclass(frozen=True)
class DescriptorConfig:
    """Shape-context descriptor (features/itkDescriptorMeshFilter.txx:81-93)."""

    radius_mm: float = 30.0
    radius_bins: int = 5          # log-radial
    orient_bins: int = 4          # azimuth == elevation bins (angles mod pi)
    min_neighbors: int = 100      # (:577)
    max_neighbors: int = 2048     # static gather capacity per keypoint

    @property
    def dim(self) -> int:
        return (1 + (self.radius_bins - 1) * self.orient_bins * self.orient_bins) * 3


@dataclasses.dataclass(frozen=True)
class IndexingConfig:
    """Stage-2 initialization (rrl/examples/indexing_one_descriptor.cxx)."""

    keypoint_radius_mm: float = 30.0  # fixed keypoints near query (:1148)
    max_query_keypoints: int = 64     # static cap on fixed keypoints per query
    num_candidates: int = 20          # top candidates kept (:1411)
    good_distance_mm: float = 9.0     # GT eval threshold (:1056)
    good_angle_deg: float = 20.0      # (:1057)


@dataclasses.dataclass(frozen=True)
class EstimationConfig:
    """Stage-3 symmetric robust affine ICP
    (rrl/rrl_estimation_symmetric_ICP_matching_all.txx)."""

    initial_matches: int = 1000   # per-iteration moving sample (:287)
    max_matches: int = 8000       # static capacity = cap on the doubling schedule
    max_iterations: int = 70      # driver cap (itkLocationRegistration.cxx:2412)
    convergence_tol: float = 1e-4  # |d weighted error| (:383)
    max_oscillations: int = 10    # (:406, .h:156)
    roi_mm: float = 50.0          # ROI half... full extent per side (itkLocationRegistration.cxx:425-427)
    min_region_features: int = 1000   # (itkLocationRegistration.cxx:1632)
    target_region_features: int = 1500  # (:1487)
    bt_constant: float = 4.0      # Beaton-Tukey b (cdcl/cdcl_utils.h:142)
    spatial_falloff: float = 5.0  # weight 1/(1 + k d^2) (cdcl_estimation_ICP_matching_all.txx:972-1004)
    muse_min_frac: float = 0.1    # MUSE quantile search band
    muse_max_frac: float = 0.9
    singular_value_bounds: Tuple[float, float] = (0.1, 10.0)  # validTransform (:2914-2926)


@dataclasses.dataclass(frozen=True)
class VerifyConfig:
    """Stage-3 SVM verification (rrl/itkLocationRegistration.cxx:2088-2109)."""

    accept_probability: float = 0.5
    model_path: Optional[str] = None  # libsvm model; None => built-in surrogate


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    features: FeatureConfig = FeatureConfig()
    keypoints: KeypointConfig = KeypointConfig()
    descriptors: DescriptorConfig = DescriptorConfig()
    indexing: IndexingConfig = IndexingConfig()
    estimation: EstimationConfig = EstimationConfig()
    verify: VerifyConfig = VerifyConfig()
    seed: int = 0


DEFAULT = PipelineConfig()
