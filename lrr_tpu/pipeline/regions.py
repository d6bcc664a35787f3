"""Watershed-region-based feature selection.

Re-implements FeaturesInRegions (rrl/itkLocationRegistration.cxx:1363-1522):
when oversegmentation labels are available, the estimation's feature subset
is not a plain ROI box but a union of whole watershed regions around the
query, grown until at least `target` features are collected
(>=1500 targeted, .cxx:1487).

Vectorized formulation: gather each feature's region label from the label
volume; compute every region's distance-to-query as the min over its
features (a scatter-min over labels); include regions in increasing region
distance until the cumulative feature count reaches the target — i.e. the
inclusion threshold is the region distance of the target-th feature in
region-distance order.  Whole regions enter or not, exactly like the
reference's region growing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lrr_tpu.types import FeatureSet, Volume


def feature_region_labels(
    features: FeatureSet, labels: jax.Array, origin: jax.Array, spacing: jax.Array
) -> jax.Array:
    """Nearest-voxel gather of watershed labels at feature locations."""
    D, H, W = labels.shape
    gi = jnp.round((features.xyz - origin) / spacing).astype(jnp.int32)
    x = jnp.clip(gi[:, 0], 0, W - 1)
    y = jnp.clip(gi[:, 1], 0, H - 1)
    z = jnp.clip(gi[:, 2], 0, D - 1)
    return labels[z, y, x]


def select_features_in_regions(
    features: FeatureSet,
    labels: jax.Array,  # int32 [D, H, W] watershed labels (flat-index values)
    origin: jax.Array,
    spacing: jax.Array,
    query_xyz: jax.Array,
    target: int,
    max_distance_mm: float = 100.0,
    box_lo: jax.Array | None = None,
    box_hi: jax.Array | None = None,
) -> jax.Array:
    """bool [N]: features in the grown region union around the query.

    With `box_lo`/`box_hi`, growth is RESTRICTED to the ROI box — the
    reference's semantics: FeaturesInRegions first collects only in-box
    features (itkLocationRegistration.cxx:1400-1404,1432-1436), then adds
    whole regions (of those in-box features) in distance order until the
    target or box exhaustion (:1487-1497,1512-1521); the grown set never
    leaves the box."""
    n_cells = labels.size
    lab = feature_region_labels(features, labels, origin, spacing)

    sel = features.mask
    if box_lo is not None:
        sel = sel & jnp.all(
            (features.xyz >= box_lo) & (features.xyz <= box_hi), axis=-1
        )
    d = jnp.linalg.norm(features.xyz - query_xyz, axis=-1)
    d = jnp.where(sel, d, jnp.inf)

    # per-region min feature distance (scatter-min over label values)
    big = jnp.asarray(jnp.inf, d.dtype)
    region_min = jnp.full((n_cells,), big, d.dtype)
    region_min = region_min.at[lab].min(d, mode="drop")
    feat_region_d = region_min[lab]
    feat_region_d = jnp.where(sel, feat_region_d, jnp.inf)

    # threshold = region distance of the target-th feature in that order
    k = min(target, d.shape[0])
    sorted_rd = jnp.sort(feat_region_d)
    tau = sorted_rd[k - 1]
    tau = jnp.minimum(tau, max_distance_mm)
    return sel & (feat_region_d <= tau)


def compact_feature_labels(
    features: FeatureSet, labels, origin, spacing
) -> jax.Array:
    """Host-side stage-1 helper: per-feature watershed region ids, compacted
    to [0, n_distinct) so the per-candidate selection can scatter into a
    capacity-sized array instead of one sized by the label VOLUME (49M voxels
    at reference scale).  Padding rows get id 0; they are masked out of every
    downstream reduction."""
    import numpy as np

    lab = np.asarray(
        feature_region_labels(
            features, jnp.asarray(labels), jnp.asarray(origin), jnp.asarray(spacing)
        )
    )
    lab = np.where(np.asarray(features.mask), lab, lab.min() if lab.size else 0)
    _, compact = np.unique(lab, return_inverse=True)
    return jnp.asarray(compact.astype(np.int32))


def select_features_by_labels(
    features: FeatureSet,
    feat_labels: jax.Array,  # int32 [N] compact per-feature region ids
    query_xyz: jax.Array,
    target: int,
    max_distance_mm: float = 100.0,
    box_lo: jax.Array | None = None,
    box_hi: jax.Array | None = None,
) -> jax.Array:
    """bool [N]: FeaturesInRegions on precomputed per-feature region labels
    (rrl/itkLocationRegistration.cxx:1363-1522, target >=1500 at :1487).

    Identical region-growing semantics to select_features_in_regions —
    whole regions enter in order of their min feature distance to the query
    until the cumulative count reaches `target` — but the scatter-min runs
    over a feature-capacity-sized array (compact ids < N), so it is cheap
    enough to evaluate per candidate inside the vmapped PASS-1 setup.

    With `box_lo`/`box_hi`, growth is RESTRICTED to the ROI box like the
    reference's: only in-box features are collected and grouped
    (itkLocationRegistration.cxx:1400-1404,1432-1436), so the grown set
    never leaves the box and simply exhausts it when the box holds fewer
    than `target` features.  Growing UNBOUNDED instead (the pre-round-5
    behavior) reached ~110 mm effective ROIs at reference-scale phantom
    density, and the added far structure measurably broke refinement:
    rank-0 candidates with 3-5 mm initial error refined to 6-16 mm alias
    optima (rank0_diagnosis.json A/B: 11/16 rank-0 good refined with
    unbounded growth vs 16/16 with in-box selection)."""
    n = feat_labels.shape[0]
    sel = features.mask
    if box_lo is not None:
        sel = sel & jnp.all(
            (features.xyz >= box_lo) & (features.xyz <= box_hi), axis=-1
        )
    d = jnp.linalg.norm(features.xyz - query_xyz, axis=-1)
    d = jnp.where(sel, d, jnp.inf)

    big = jnp.asarray(jnp.inf, d.dtype)
    region_min = jnp.full((n,), big, d.dtype)
    region_min = region_min.at[feat_labels].min(d, mode="drop")
    feat_region_d = region_min[feat_labels]
    feat_region_d = jnp.where(sel, feat_region_d, jnp.inf)

    k = min(target, n)
    tau = jnp.sort(feat_region_d)[k - 1]
    tau = jnp.minimum(tau, max_distance_mm)
    return sel & (feat_region_d <= tau)
