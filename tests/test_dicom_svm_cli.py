"""DICOM series IO, svmlight IO, and the data-prep / SVM CLI subcommands."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.io.dicom import (
    read_dicom_series,
    read_volume_any,
    write_dicom_series,
)
from lrr_tpu.io.svmlight import (
    apply_scale,
    fit_scale,
    read_range_file,
    read_svmlight,
    write_range_file,
    write_svmlight,
)
from lrr_tpu.types import Volume


@pytest.fixture
def volume(rng):
    data = rng.integers(-1000, 2000, (6, 10, 12)).astype(np.float32)
    return Volume(
        data=jnp.asarray(data),
        origin=jnp.asarray([-5.0, 2.0, 10.0], jnp.float32),
        spacing=jnp.asarray([0.7, 0.8, 2.5], jnp.float32),
    )


class TestDicom:
    def test_round_trip(self, tmp_path, volume):
        d = str(tmp_path / "series")
        write_dicom_series(d, volume)
        back = read_dicom_series(d)
        np.testing.assert_array_equal(np.asarray(back.data), np.asarray(volume.data))
        np.testing.assert_allclose(np.asarray(back.origin), np.asarray(volume.origin), atol=1e-4)
        np.testing.assert_allclose(np.asarray(back.spacing), np.asarray(volume.spacing), atol=1e-4)

    def test_slice_order_from_position(self, tmp_path, volume):
        """Slices shuffled on disk still stack in position order."""
        d = str(tmp_path / "series")
        write_dicom_series(d, volume)
        # rename to reverse the lexicographic file order
        files = sorted(os.listdir(d))
        for i, name in enumerate(files):
            os.rename(os.path.join(d, name), os.path.join(d, f"z{99-i:02d}.dcm"))
        back = read_dicom_series(d)
        np.testing.assert_array_equal(np.asarray(back.data), np.asarray(volume.data))

    def test_read_volume_any_dispatch(self, tmp_path, volume):
        from lrr_tpu.io.mhd import write_mhd

        d = str(tmp_path / "series")
        write_dicom_series(d, volume)
        v1 = read_volume_any(d)
        p = str(tmp_path / "vol.mhd")
        write_mhd(p, np.asarray(volume.data), np.asarray(volume.origin), np.asarray(volume.spacing))
        v2 = read_volume_any(p)
        np.testing.assert_array_equal(np.asarray(v1.data), np.asarray(v2.data))


class TestSvmlight:
    def test_round_trip(self, tmp_path, rng):
        x = rng.standard_normal((20, 8)).astype(np.float32)
        y = (rng.uniform(size=20) > 0.5).astype(np.float32)
        p = str(tmp_path / "d.txt")
        write_svmlight(p, x, y)
        x2, y2 = read_svmlight(p)
        np.testing.assert_allclose(x2, x, rtol=1e-5)
        np.testing.assert_array_equal(y2, y)

    def test_scale_and_range_file(self, tmp_path, rng):
        x = rng.uniform(-5, 30, (50, 8)).astype(np.float32)
        s = fit_scale(x)
        xs = apply_scale(x, s)
        assert xs.min() >= -1.0 - 1e-6 and xs.max() <= 1.0 + 1e-6
        p = str(tmp_path / "range")
        write_range_file(p, s)
        s2 = read_range_file(p)
        np.testing.assert_allclose(apply_scale(x, s2), xs, atol=1e-6)


class TestCli:
    def test_crop_volume_mhd(self, tmp_path, volume):
        from lrr_tpu.cli import main
        from lrr_tpu.io.mhd import read_mhd_volume, write_mhd

        src = str(tmp_path / "in.mhd")
        write_mhd(src, np.asarray(volume.data), np.asarray(volume.origin), np.asarray(volume.spacing))
        dst = str(tmp_path / "out.mhd")
        main(["crop-volume", src, dst, "--start", "2,1,1", "--size", "5,4,3"])
        out = read_mhd_volume(dst)
        assert out.data.shape == (3, 4, 5)
        np.testing.assert_array_equal(
            np.asarray(out.data), np.asarray(volume.data)[1:4, 1:5, 2:7]
        )
        np.testing.assert_allclose(
            np.asarray(out.origin),
            np.asarray(volume.origin) + np.asarray(volume.spacing) * [2, 1, 1],
            atol=1e-5,
        )

    def test_crop_volume_dicom_io(self, tmp_path, volume):
        from lrr_tpu.cli import main

        src = str(tmp_path / "series")
        write_dicom_series(src, volume)
        dst = str(tmp_path / "cropped")
        main(["crop-volume", src, dst, "--start", "0,0,2", "--size", "12,10,3"])
        out = read_dicom_series(dst)
        np.testing.assert_array_equal(
            np.asarray(out.data), np.asarray(volume.data)[2:5]
        )

    def test_extract_slice(self, tmp_path, volume):
        from lrr_tpu.cli import main

        src = str(tmp_path / "series")
        write_dicom_series(src, volume)
        dst = str(tmp_path / "s.png")
        main([
            "extract-slice", src, dst, "--location", "0,6,17",
            "--axis", "axial", "--extent", "4",
        ])
        assert os.path.getsize(dst) > 100

    def test_svm_train_scale_predict(self, tmp_path, rng):
        from lrr_tpu.cli import main

        n = 40
        x = np.concatenate(
            [rng.normal(-2, 0.5, (n, 4)), rng.normal(2, 0.5, (n, 4))]
        ).astype(np.float32)
        y = np.concatenate([np.zeros(n), np.ones(n)]).astype(np.float32)
        raw = str(tmp_path / "raw.txt")
        write_svmlight(raw, x, y)

        scaled = str(tmp_path / "scaled.txt")
        rngf = str(tmp_path / "range")
        main(["svm-scale", raw, scaled, "-s", rngf])
        assert os.path.exists(rngf)

        model = str(tmp_path / "m.model")
        main(["svm-train", scaled, model, "--steps", "200"])
        pred = str(tmp_path / "pred.txt")
        main(["svm-predict", scaled, model, pred, "-b"])
        lines = open(pred).read().strip().splitlines()
        assert lines[0].startswith("labels")
        got = np.asarray([float(ln.split()[0]) for ln in lines[1:]])
        assert np.mean(got == y) > 0.9
