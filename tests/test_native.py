import os

import numpy as np
import pytest

from lrr_tpu.io.mhd import read_mhd, write_mhd
from lrr_tpu.io.native_loader import VolumeLoader, get_lib, read_mhd_native


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


class TestNativeMhd:
    @pytest.mark.parametrize("compressed", [False, True])
    def test_matches_python_reader(self, tmp_path, rng, lib, compressed):
        data = rng.integers(-500, 500, (6, 7, 9)).astype(np.int16)
        p = str(tmp_path / "vol.mha")
        write_mhd(p, data, origin=(1, 2, 3), spacing=(0.5, 1.5, 2.0), compressed=compressed)
        out = read_mhd_native(p)
        assert out is not None
        nd, no, ns = out
        pd, po, ps = read_mhd(p)
        np.testing.assert_array_equal(nd, pd)
        np.testing.assert_allclose(no, po, rtol=1e-6)
        np.testing.assert_allclose(ns, ps, rtol=1e-6)

    def test_mhd_raw_pair(self, tmp_path, rng, lib):
        data = rng.standard_normal((4, 5, 6)).astype(np.float32)
        p = str(tmp_path / "vol.mhd")
        write_mhd(p, data)
        nd, _, _ = read_mhd_native(p)
        np.testing.assert_array_equal(nd, data)


class TestB64:
    def test_decode(self, lib, rng):
        import base64
        import ctypes

        raw = rng.integers(0, 255, 257).astype(np.uint8).tobytes()
        text = base64.b64encode(raw)
        out = np.empty(len(raw) + 8, np.uint8)
        n = lib.lrr_b64_decode(
            text, len(text), out.ctypes.data_as(ctypes.c_void_p), out.size
        )
        assert n == len(raw)
        assert out[:n].tobytes() == raw


class TestLoader:
    def test_prefetch_in_order(self, tmp_path, rng, lib):
        paths = []
        vols = []
        for i in range(6):
            v = rng.integers(0, 100, (4, 4, 4)).astype(np.int16)
            p = str(tmp_path / f"v{i}.mha")
            write_mhd(p, v, origin=(i, 0, 0))
            paths.append(p)
            vols.append(v)
        loader = VolumeLoader(paths, n_threads=3, max_queue=2)
        for i, (data, origin, spacing) in enumerate(loader):
            np.testing.assert_array_equal(data, vols[i])
            assert origin[0] == i
        loader.close()

    def test_fallback_without_native(self, tmp_path, rng, monkeypatch):
        import lrr_tpu.io.native_loader as nl

        v = rng.integers(0, 100, (3, 3, 3)).astype(np.int16)
        p = str(tmp_path / "v.mha")
        write_mhd(p, v)
        monkeypatch.setattr(nl, "get_lib", lambda: None)
        loader = nl.VolumeLoader([p])
        data, _, _ = next(loader)
        np.testing.assert_array_equal(data, v)
