from lrr_tpu.viz.panels import (
    checkerboard_panels,
    overlay_covariance_ellipses,
    overlay_features,
    save_png,
    slice_panel,
)

__all__ = [
    "checkerboard_panels",
    "overlay_covariance_ellipses",
    "overlay_features",
    "save_png",
    "slice_panel",
]
