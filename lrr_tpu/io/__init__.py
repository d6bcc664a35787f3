from lrr_tpu.io.mhd import read_mhd, write_mhd
from lrr_tpu.io.vtk_xml import PolyData, read_vtp, write_vtp
from lrr_tpu.io.features_io import (
    read_descriptors,
    read_features,
    read_keypoints,
    write_descriptors,
    write_features,
    write_keypoints,
)

__all__ = [
    "read_mhd", "write_mhd", "PolyData", "read_vtp", "write_vtp",
    "read_features", "write_features", "read_keypoints", "write_keypoints",
    "read_descriptors", "write_descriptors",
]
