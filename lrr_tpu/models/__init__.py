"""Transform models (the reference's cdcl_trans hierarchy, as pure pytrees)."""

from lrr_tpu.models.affine import Affine3D
from lrr_tpu.models.rigid import Rigid3D
from lrr_tpu.models.similarity import Similarity2D

__all__ = ["Affine3D", "Rigid3D", "Similarity2D"]
