"""FeatureSet / KeypointSet / DescriptorSet <-> reference polydata formats.

Array names and layouts match the reference writers so artifacts are
interchangeable for golden-parity testing:
  features    — Points + "normals"[3] "binormals"[3] "errorProjectors"[9]
                "strengths"[1] "shapes"[1, uint8]
                (features/vtkITKPointSetToPolyDataFilter.cxx:147-180)
  keypoints   — Points + "normals" "binormals" (cdcl/cdcl_utils_VTKIO)
  descriptors — Points + "descriptors"[195] "normals" "binormals"
                (features/vtkITKDescriptorPointSetToPolyDataFilter
                .cxx:155-165)

Reading a feature file reconstructs the direction list / error projector
exactly like vtkPolyDataToFeaturesWithShapeFilter (corner tangent = normal x
binormal, etc.).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from lrr_tpu.io.vtk_xml import PolyData, read_vtp, write_vtp
from lrr_tpu.types import (
    CORNER,
    SHEET,
    TUBE,
    DescriptorSet,
    FeatureSet,
    KeypointSet,
)


def write_features(path: str, fs: FeatureSet):
    m = np.asarray(fs.mask)
    poly = PolyData(
        points=np.asarray(fs.xyz)[m].astype(np.float32),
        point_data={
            "normals": np.asarray(fs.directions)[m][:, 0, :].astype(np.float32),
            "binormals": np.asarray(fs.directions)[m][:, 1, :].astype(np.float32),
            "errorProjectors": np.asarray(fs.projector)[m].reshape(-1, 9).astype(np.float32),
            "strengths": np.asarray(fs.strength)[m].astype(np.float32),
            "shapes": np.asarray(fs.shape)[m].astype(np.uint8),
        },
    )
    write_vtp(path, poly)


def read_features(path: str, capacity: int | None = None) -> FeatureSet:
    poly = read_vtp(path)
    n = poly.points.shape[0]
    cap = capacity or n
    shapes = poly.point_data["shapes"].astype(np.int32).reshape(-1)
    normals = poly.point_data["normals"].astype(np.float32)
    binormals = poly.point_data.get(
        "binormals", np.zeros_like(normals)
    ).astype(np.float32)
    proj = poly.point_data["errorProjectors"].astype(np.float32).reshape(-1, 3, 3)
    strengths = poly.point_data["strengths"].astype(np.float32).reshape(-1)

    dirs = np.zeros((n, 3, 3), np.float32)
    dirs[:, 0, :] = normals
    tube_or_corner = shapes != SHEET
    dirs[tube_or_corner, 1, :] = binormals[tube_or_corner]
    corner = shapes == CORNER
    tangent = np.cross(normals[corner], binormals[corner])
    nrm = np.linalg.norm(tangent, axis=-1, keepdims=True)
    dirs[corner, 2, :] = tangent / np.maximum(nrm, 1e-12)

    def pad(x):
        w = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, w)

    mask = np.zeros(cap, bool)
    mask[:n] = True
    return FeatureSet(
        xyz=jnp.asarray(pad(poly.points.astype(np.float32))),
        strength=jnp.asarray(pad(strengths)),
        shape=jnp.asarray(pad(shapes)),
        projector=jnp.asarray(pad(proj)),
        directions=jnp.asarray(pad(dirs)),
        mask=jnp.asarray(mask),
    )


def write_keypoints(path: str, kp: KeypointSet):
    m = np.asarray(kp.mask)
    poly = PolyData(
        points=np.asarray(kp.xyz)[m].astype(np.float32),
        point_data={
            "normals": np.asarray(kp.normal)[m].astype(np.float32),
            "binormals": np.asarray(kp.binormal)[m].astype(np.float32),
            "strengths": np.asarray(kp.strength)[m].astype(np.float32),
        },
    )
    write_vtp(path, poly)


def read_keypoints(path: str, capacity: int | None = None) -> KeypointSet:
    poly = read_vtp(path)
    n = poly.points.shape[0]
    cap = capacity or n

    def pad(x):
        w = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, w)

    mask = np.zeros(cap, bool)
    mask[:n] = True
    strengths = poly.point_data.get("strengths", np.ones(n, np.float32))
    return KeypointSet(
        xyz=jnp.asarray(pad(poly.points.astype(np.float32))),
        strength=jnp.asarray(pad(strengths.astype(np.float32).reshape(-1))),
        normal=jnp.asarray(pad(poly.point_data["normals"].astype(np.float32))),
        binormal=jnp.asarray(pad(poly.point_data["binormals"].astype(np.float32))),
        mask=jnp.asarray(mask),
    )


def write_descriptors(path: str, ds: DescriptorSet):
    kp = ds.keypoints
    m = np.asarray(kp.mask)
    poly = PolyData(
        points=np.asarray(kp.xyz)[m].astype(np.float32),
        point_data={
            "descriptors": np.asarray(ds.descriptors)[m].astype(np.float32),
            "normals": np.asarray(kp.normal)[m].astype(np.float32),
            "binormals": np.asarray(kp.binormal)[m].astype(np.float32),
        },
    )
    write_vtp(path, poly)


def read_descriptors(path: str, capacity: int | None = None) -> DescriptorSet:
    poly = read_vtp(path)
    n = poly.points.shape[0]
    cap = capacity or n

    def pad(x):
        w = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, w)

    mask = np.zeros(cap, bool)
    mask[:n] = True
    kp = KeypointSet(
        xyz=jnp.asarray(pad(poly.points.astype(np.float32))),
        strength=jnp.asarray(np.where(mask, 1.0, 0.0).astype(np.float32)),
        normal=jnp.asarray(pad(poly.point_data["normals"].astype(np.float32))),
        binormal=jnp.asarray(pad(poly.point_data["binormals"].astype(np.float32))),
        mask=jnp.asarray(mask),
    )
    return DescriptorSet(
        keypoints=kp,
        descriptors=jnp.asarray(pad(poly.point_data["descriptors"].astype(np.float32))),
    )
