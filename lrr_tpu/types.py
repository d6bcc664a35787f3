"""Core array-first data model.

The reference stores features as vectors of ref-counted objects
(``cdcl/cdcl_feature.h:17``, ``cdcl_feature_with_shape.h:23``,
``cdcl_feature_ICP.h:23``, ``cdcl_keypoint.h:14``).  On TPU everything is a
struct-of-arrays pytree with a fixed (padded) leading dimension and a validity
mask, so every downstream op is a fixed-shape XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Feature shape classes.  Order matches the reference enum
# (cdcl/cdcl_feature_with_shape.h:30 — ``enum shape_type { CORNER, TUBE,
# SHEET }``) so serialized artifacts are interchangeable.
CORNER = 0
TUBE = 1
SHEET = 2

SHAPE_NAMES = ("corner", "tube", "sheet")

# Length of the oriented shape-context descriptor:
# (1 + (5-1)*4*4) * 3 = 195 (features/itkDescriptorMeshFilter.txx:373).
DESCRIPTOR_DIM = 195


class FeatureSet(struct.PyTreeNode):
    """Padded struct-of-arrays feature set.

    Equivalent payload to ``cdcl_feature_with_shape``/``cdcl_feature_ICP``
    (location, strength, shape class, error projector, directions) with an
    explicit validity mask instead of a dynamic count.

    Attributes:
      xyz:        [N, 3] physical locations (mm).
      strength:   [N]   detector response (gamma-normalized).
      shape:      [N]   int8/int32 shape class (CORNER/TUBE/SHEET).
      projector:  [N, 3, 3] error projector P; residual metric is e^T P e
                  (sheet: n n^T, tube: I - t t^T, corner: I;
                  features/itkFeatureImageFilter.txx:1009-1097).
      directions: [N, 3, 3] rows are unit direction vectors; row i is valid
                  for i < ndirs(shape). For sheets row0 = normal; for tubes
                  row0 = tangent; corners have 3 maxima directions.
      mask:       [N] bool, True for real entries (padding is False).
    """

    xyz: jax.Array
    strength: jax.Array
    shape: jax.Array
    projector: jax.Array
    directions: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    @classmethod
    def empty(cls, n: int, dtype=jnp.float32) -> "FeatureSet":
        return cls(
            xyz=jnp.zeros((n, 3), dtype),
            strength=jnp.zeros((n,), dtype),
            shape=jnp.zeros((n,), jnp.int32),
            projector=jnp.zeros((n, 3, 3), dtype),
            directions=jnp.zeros((n, 3, 3), dtype),
            mask=jnp.zeros((n,), bool),
        )

    def take(self, idx: jax.Array, valid: Optional[jax.Array] = None) -> "FeatureSet":
        """Gather rows by index; optionally AND the mask with `valid`."""
        mask = self.mask[idx]
        if valid is not None:
            mask = jnp.logical_and(mask, valid)
        return FeatureSet(
            xyz=self.xyz[idx],
            strength=self.strength[idx],
            shape=self.shape[idx],
            projector=self.projector[idx],
            directions=self.directions[idx],
            mask=mask,
        )


class KeypointSet(struct.PyTreeNode):
    """Keypoints: corner features with an attached local frame.

    The reference keypoint carries ``normal_`` and (3D) ``binormal_``
    (cdcl/cdcl_keypoint.h:63-118); together with their cross product they
    define the frame used to initialize rigid transforms.

    Attributes:
      xyz:      [K, 3]
      strength: [K]
      normal:   [K, 3] unit
      binormal: [K, 3] unit, orthogonal to normal
      mask:     [K] bool
    """

    xyz: jax.Array
    strength: jax.Array
    normal: jax.Array
    binormal: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    def frame(self) -> jax.Array:
        """[K, 3, 3] rotation whose columns are (normal, binormal, n x b)."""
        t = jnp.cross(self.normal, self.binormal)
        return jnp.stack([self.normal, self.binormal, t], axis=-1)

    @classmethod
    def empty(cls, k: int, dtype=jnp.float32) -> "KeypointSet":
        return cls(
            xyz=jnp.zeros((k, 3), dtype),
            strength=jnp.zeros((k,), dtype),
            normal=jnp.zeros((k, 3), dtype),
            binormal=jnp.zeros((k, 3), dtype),
            mask=jnp.zeros((k,), bool),
        )


class DescriptorSet(struct.PyTreeNode):
    """Keypoints plus their 195-d oriented shape-context descriptors.

    Mirrors the per-point payload of the reference descriptor polydata files
    (direction, bidirection, 195 floats;
    features/vtkITKDescriptorPointSetToPolyDataFilter.cxx).
    """

    keypoints: KeypointSet
    descriptors: jax.Array  # [K, 195]

    @property
    def capacity(self) -> int:
        return self.descriptors.shape[-2]


class Volume(struct.PyTreeNode):
    """A 3D scalar volume with physical geometry.

    data is indexed [z, y, x]; `origin`/`spacing` are (x, y, z) in mm to
    match MetaImage conventions used by the reference pipeline.
    """

    data: jax.Array  # [D, H, W]
    origin: jax.Array  # [3] (x, y, z) mm
    spacing: jax.Array  # [3] (x, y, z) mm

    @property
    def shape_zyx(self):
        return self.data.shape

    def index_to_physical(self, ijk: jax.Array) -> jax.Array:
        """Continuous index (x, y, z order) -> physical point."""
        return self.origin + ijk * self.spacing

    def physical_to_index(self, xyz: jax.Array) -> jax.Array:
        return (xyz - self.origin) / self.spacing


class MatchSet(struct.PyTreeNode):
    """Fixed-shape correspondence set for one estimation direction.

    Equivalent to the vector of single-element ``cdcl_match`` objects used by
    the production matching-all estimators (cdcl/cdcl_match.h:18,
    rrl/rrl_estimation_ICP_matching_all.txx:494-571), flattened to arrays:
    moving point i corresponds to fixed point `to_idx[i]`.

    Attributes:
      from_xyz:  [M, 3] moving locations (untransformed).
      to_xyz:    [M, 3] matched fixed locations.
      projector: [M, 3, 3] fixed feature error projector.
      weight:    [M] robust weight (includes strength/spatial factors).
      mask:      [M] bool validity.
    """

    from_xyz: jax.Array
    to_xyz: jax.Array
    projector: jax.Array
    weight: jax.Array
    mask: jax.Array


def concat_feature_sets(a: FeatureSet, b: FeatureSet) -> FeatureSet:
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


def pad_to(x: np.ndarray, n: int, axis: int = 0, fill=0):
    """numpy-side helper: pad array to length n along axis."""
    pad = n - x.shape[axis]
    if pad < 0:
        raise ValueError(f"cannot pad {x.shape[axis]} down to {n}")
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=fill)


def feature_set_from_numpy(
    xyz: np.ndarray,
    strength: np.ndarray,
    shape: np.ndarray,
    projector: np.ndarray,
    directions: np.ndarray,
    capacity: Optional[int] = None,
    dtype=np.float32,
) -> FeatureSet:
    """Build a padded FeatureSet from host arrays of true length n."""
    n = xyz.shape[0]
    cap = capacity if capacity is not None else n
    mask = np.zeros((cap,), bool)
    mask[:n] = True
    return FeatureSet(
        xyz=jnp.asarray(pad_to(xyz.astype(dtype), cap)),
        strength=jnp.asarray(pad_to(strength.astype(dtype), cap)),
        shape=jnp.asarray(pad_to(shape.astype(np.int32), cap)),
        projector=jnp.asarray(pad_to(projector.astype(dtype), cap)),
        directions=jnp.asarray(pad_to(directions.astype(dtype), cap)),
        mask=jnp.asarray(mask),
    )
