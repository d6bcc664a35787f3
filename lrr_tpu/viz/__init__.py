from lrr_tpu.viz.panels import checkerboard_panels, save_png, slice_panel

__all__ = ["checkerboard_panels", "save_png", "slice_panel"]
