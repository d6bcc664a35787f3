import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.pipeline.intensity import (
    mutual_information,
    ncc,
    register_intensity,
)
from lrr_tpu.utils.synthetic import make_pair


class TestMetrics:
    def test_mi_higher_for_dependent(self, rng):
        a = jnp.asarray(rng.uniform(0, 1, 4000).astype(np.float32))
        mask = jnp.ones(4000, bool)
        mi_same = float(mutual_information(a, a, mask))
        b = jnp.asarray(rng.uniform(0, 1, 4000).astype(np.float32))
        mi_indep = float(mutual_information(a, b, mask))
        assert mi_same > mi_indep + 0.5

    def test_mi_invariant_to_monotonic_remap(self, rng):
        a = jnp.asarray(rng.uniform(0, 1, 4000).astype(np.float32))
        mask = jnp.ones(4000, bool)
        mi1 = float(mutual_information(a, a, mask))
        mi2 = float(mutual_information(a, jnp.sqrt(a), mask))
        # MI of deterministic maps stays high
        assert mi2 > 0.7 * mi1

    def test_ncc(self, rng):
        a = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
        mask = jnp.ones(1000, bool)
        np.testing.assert_allclose(float(ncc(a, 2.0 * a + 1.0, mask)), 1.0, atol=1e-4)
        np.testing.assert_allclose(float(ncc(a, -a, mask)), -1.0, atol=1e-4)


class TestRegisterIntensity:
    @pytest.mark.parametrize("metric", ["ncc", "mi"])
    def test_recovers_translation(self, metric):
        fixed, moving, true = make_pair(
            (40, 40, 40), rotation_deg=0.0, translation=(3.0, -2.0, 1.0), seed=2
        )
        res = register_intensity(
            fixed, moving, levels=2, iterations_per_level=60,
            samples=8192, metric=metric, learning_rate=0.05,
        )
        # res.trans should approximate `true` (moving->fixed); compare maps
        pts = jnp.asarray(
            np.random.default_rng(0).uniform(10, 30, (30, 3)).astype(np.float32)
        )
        got = np.asarray(res.trans.apply(pts))
        want = np.asarray(true.apply(pts))
        err = np.linalg.norm(got - want, axis=1)
        assert np.median(err) < 1.5, (metric, np.median(err))
