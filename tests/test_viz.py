import os

import jax.numpy as jnp
import numpy as np

from lrr_tpu.models import Affine3D
from lrr_tpu.utils.synthetic import make_pair
from lrr_tpu.viz import checkerboard_panels, save_png, slice_panel


class TestViz:
    def test_png_roundtrip_magic(self, tmp_path, rng):
        img = rng.integers(0, 255, (32, 48)).astype(np.uint8)
        p = str(tmp_path / "x.png")
        save_png(p, img)
        with open(p, "rb") as f:
            data = f.read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert b"IHDR" in data and b"IEND" in data

    def test_slice_panel_shape(self):
        fixed, moving, true = make_pair((32, 32, 32), seed=4)
        panel = slice_panel(fixed, [16.0, 16.0, 16.0], axis=2, resolution=64)
        assert panel.shape == (64, 64)
        assert np.isfinite(panel).all()

    def test_checkerboard_panels_aligned_vs_not(self, tmp_path):
        fixed, moving, true = make_pair(
            (32, 32, 32), rotation_deg=5.0, translation=(3.0, 1.0, -2.0), seed=4
        )
        q = [16.0, 16.0, 16.0]
        good = checkerboard_panels(fixed, moving, true, q, resolution=64)
        ident = checkerboard_panels(fixed, moving, Affine3D.identity(), q, resolution=64)
        assert good.shape == (192, 192)
        # a correct transform should produce lower checker discontinuity than
        # identity: compare gradient energy of the checker column
        def energy(p):
            c = p[:, 128:]
            return np.abs(np.diff(c, axis=0)).mean() + np.abs(np.diff(c, axis=1)).mean()

        assert energy(good) < energy(ident)
        save_png(str(tmp_path / "panels.png"), good)
        assert os.path.getsize(str(tmp_path / "panels.png")) > 100


def test_overlay_features_marks_in_slab_points():
    import numpy as np
    from lrr_tpu.viz.panels import overlay_features

    panel = np.zeros((64, 64), np.float32)
    xyz = np.asarray([
        [0.0, 0.0, 25.0],   # at slice center plane (axis=2 at z=25)
        [5.0, -5.0, 25.5],  # in slab
        [0.0, 0.0, 40.0],   # out of slab
    ], np.float32)
    mask = np.ones(3, bool)
    out = overlay_features(panel, xyz, mask, [0.0, 0.0, 25.0], axis=2,
                           half_extent_mm=10.0, value=7.0)
    assert (out == 7.0).sum() >= 8   # two crosses drawn
    assert out.max() == 7.0
    # original untouched
    assert panel.max() == 0.0


def test_overlay_covariance_ellipses_geometry():
    """Glyph radii follow the in-plane covariance eigenvalues
    (vtkTensorGlyphScaled semantics): an anisotropic Gaussian draws a wide
    ellipse along its large axis, and out-of-slab glyphs are skipped."""
    import numpy as np
    from lrr_tpu.viz.panels import overlay_covariance_ellipses

    panel = np.zeros((128, 128), np.float32)
    cov = np.diag([16.0, 1.0, 1.0])  # sigma_x = 4 mm, sigma_y = 1 mm
    out = overlay_covariance_ellipses(
        panel, np.asarray([[0.0, 0.0, 25.0]]), cov[None],
        [0.0, 0.0, 25.0], axis=2, half_extent_mm=10.0, value=9.0,
    )
    ii, jj = np.nonzero(out == 9.0)
    assert ii.size > 32
    res, half = 128, 10.0
    u = ii * (2 * half) / (res - 1) - half  # first in-plane axis = x
    v = jj * (2 * half) / (res - 1) - half  # second = y
    # extents match the 1-sigma radii (pixel quantization tolerance)
    assert abs(np.abs(u).max() - 4.0) < 0.5
    assert abs(np.abs(v).max() - 1.0) < 0.5

    out2 = overlay_covariance_ellipses(
        panel, np.asarray([[0.0, 0.0, 40.0]]), cov[None],
        [0.0, 0.0, 25.0], axis=2, half_extent_mm=10.0, value=9.0,
    )
    assert out2.max() == 0.0  # out of slab: nothing drawn
