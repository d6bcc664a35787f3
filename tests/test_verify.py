import jax
import jax.numpy as jnp
import numpy as np

from lrr_tpu.verify import (
    REFERENCE_FEATURE_MAX,
    REFERENCE_FEATURE_MIN,
    SvmModel,
    fit_rbf_classifier,
    parse_libsvm_model,
    predict_probability,
    scale_measurements,
)
from lrr_tpu.verify.svm import decision_function, serialize_libsvm_model


class TestScaling:
    def test_scale_endpoints(self):
        lo = scale_measurements(jnp.asarray(REFERENCE_FEATURE_MIN))
        hi = scale_measurements(jnp.asarray(REFERENCE_FEATURE_MAX))
        np.testing.assert_allclose(np.asarray(lo), -1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(hi), 1.0, atol=1e-6)


class TestModelFormat:
    def test_roundtrip(self, rng):
        model = SvmModel(
            gamma=0.25,
            rho=0.5,
            sv=rng.standard_normal((7, 8)).astype(np.float32),
            sv_coef=rng.standard_normal(7).astype(np.float32),
            prob_a=-1.2,
            prob_b=0.1,
        )
        text = serialize_libsvm_model(model)
        back = parse_libsvm_model(text)
        np.testing.assert_allclose(back.sv, model.sv, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(back.sv_coef, model.sv_coef, rtol=1e-4, atol=1e-5)
        assert abs(back.gamma - 0.25) < 1e-6
        assert abs(back.prob_a - (-1.2)) < 1e-6
        # decision values match
        x = jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(decision_function(model, x)),
            np.asarray(decision_function(back, x)),
            rtol=1e-3, atol=1e-4,
        )

    def test_decision_function_matches_numpy(self, rng):
        model = SvmModel(
            gamma=0.5,
            rho=-0.3,
            sv=rng.standard_normal((10, 4)).astype(np.float32),
            sv_coef=rng.standard_normal(10).astype(np.float32),
            prob_a=-1.0,
            prob_b=0.0,
        )
        x = rng.standard_normal((6, 4)).astype(np.float32)
        got = np.asarray(decision_function(model, jnp.asarray(x)))
        want = np.array(
            [
                sum(
                    c * np.exp(-0.5 * np.sum((xi - s) ** 2))
                    for c, s in zip(model.sv_coef, model.sv)
                )
                + 0.3
                for xi in x
            ]
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_probability_monotonic_in_f(self):
        model = SvmModel(
            gamma=1.0, rho=0.0,
            sv=np.zeros((1, 2), np.float32),
            sv_coef=np.ones(1, np.float32),
            prob_a=-1.0, prob_b=0.0,
        )
        near = predict_probability(model, jnp.asarray([[0.0, 0.0]]))
        far = predict_probability(model, jnp.asarray([[10.0, 10.0]]))
        assert float(near[0]) > float(far[0])


class TestTraining:
    def test_learns_separable_problem(self, rng):
        # aligned: small errors/angles; misaligned: large
        n = 200
        aligned = np.concatenate(
            [rng.uniform(0.8, 2.0, (n, 1)), rng.uniform(0.1, 5.0, (n, 1)),
             rng.uniform(10, 25, (n, 2)), rng.uniform(0.7, 1.5, (n, 1)),
             rng.uniform(0.1, 3.0, (n, 1)), rng.uniform(10, 22, (n, 2))],
            axis=1,
        ).astype(np.float32)
        misaligned = np.concatenate(
            [rng.uniform(5, 16, (n, 1)), rng.uniform(30, 139, (n, 1)),
             rng.uniform(40, 62, (n, 2)), rng.uniform(1.2, 1.6, (n, 1)),
             rng.uniform(20, 60, (n, 1)), rng.uniform(35, 60, (n, 2))],
            axis=1,
        ).astype(np.float32)
        X = np.concatenate([aligned, misaligned])
        y = np.concatenate([np.ones(n), np.zeros(n)])
        Xs = np.asarray(scale_measurements(jnp.asarray(X)))
        model = fit_rbf_classifier(Xs, y, steps=300)

        p = np.asarray(predict_probability(model, jnp.asarray(Xs)))
        acc = ((p > 0.5) == (y > 0)).mean()
        assert acc > 0.95, acc

    def test_generalizes(self, rng):
        n = 150
        X = rng.standard_normal((2 * n, 3)).astype(np.float32)
        y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(np.float32)
        model = fit_rbf_classifier(X[:n], y[:n], gamma=0.5, steps=400)
        p = np.asarray(predict_probability(model, jnp.asarray(X[n:])))
        acc = ((p > 0.5) == (y[n:] > 0)).mean()
        assert acc > 0.85, acc


class TestSmoParity:
    """SMO C-SVC trainer vs a model trained by the REFERENCE's svm-train.

    tests/data/svm_fixture.model was produced by compiling the vendored
    libsvm (/root/reference/libsvm/svm.cpp, unmodified) and running
    `svm-train -t 2 -c 1 -g 0.125 -e 0.001` on svm_fixture.svmlight
    (reference printout: obj = -22.564310, rho = 0.092108, nSV = 43)."""

    def _fixture(self):
        import os

        from lrr_tpu.io.svmlight import read_svmlight

        d = os.path.join(os.path.dirname(__file__), "data")
        X, y = read_svmlight(os.path.join(d, "svm_fixture.svmlight"))
        with open(os.path.join(d, "svm_fixture.model")) as f:
            ref = parse_libsvm_model(f.read())
        return np.asarray(X, np.float64), np.asarray(y), ref

    def test_dual_optimum_matches_reference(self):
        from lrr_tpu.verify.smo import rbf_kernel, smo_solve

        X, y, ref = self._fixture()
        yy = np.where(y > 0, 1.0, -1.0)
        K = rbf_kernel(X, 0.125)
        alpha, rho, _ = smo_solve(K, yy, 1.0)
        Q = (yy[:, None] * yy[None, :]) * K
        obj = 0.5 * alpha @ Q @ alpha - alpha.sum()
        assert abs(obj - (-22.564310)) < 1e-3, obj
        assert abs(rho - ref.rho) < 2e-3, (rho, ref.rho)
        assert int((alpha > 1e-12).sum()) == ref.sv.shape[0]

    def test_decision_values_match_reference(self):
        import jax.numpy as jnp

        from lrr_tpu.verify.smo import train_c_svc
        from lrr_tpu.verify.svm import decision_function

        X, y, ref = self._fixture()
        ours = train_c_svc(X, y, C=1.0, gamma=0.125, probability=False)
        # reference svmlight keys are 1-based -> its sv has a dead col 0
        ref_aligned = SvmModel(
            gamma=ref.gamma, rho=ref.rho, sv=ref.sv[:, 1:],
            sv_coef=ref.sv_coef, prob_a=ref.prob_a, prob_b=ref.prob_b,
        )
        f_ref = np.asarray(decision_function(ref_aligned, jnp.asarray(X, jnp.float32)))
        f_our = np.asarray(decision_function(ours, jnp.asarray(X, jnp.float32)))
        np.testing.assert_allclose(f_our, f_ref, atol=5e-3)
        # identical hard predictions
        np.testing.assert_array_equal(f_our > 0, f_ref > 0)

    def test_probability_training_sane(self):
        from lrr_tpu.verify.smo import train_c_svc
        from lrr_tpu.verify.svm import predict_probability

        import jax.numpy as jnp

        X, y, ref = self._fixture()
        m = train_c_svc(X, y, C=1.0, gamma=0.125, probability=True)
        assert np.isfinite([m.prob_a, m.prob_b]).all()
        assert m.prob_a < 0  # decreasing f -> lower P(aligned)
        p = np.asarray(predict_probability(m, jnp.asarray(X, jnp.float32)))
        acc = ((p > 0.5) == (y > 0)).mean()
        assert acc > 0.9, acc

    def test_roundtrip_through_model_format(self):
        from lrr_tpu.verify.smo import train_c_svc
        from lrr_tpu.verify.svm import serialize_libsvm_model

        X, y, _ = self._fixture()
        m = train_c_svc(X, y, probability=False)
        m2 = parse_libsvm_model(serialize_libsvm_model(m))
        np.testing.assert_allclose(m2.sv, m.sv, rtol=1e-5)
        assert abs(m2.rho - m.rho) < 1e-5


class TestShippedVerifier:
    def test_default_model_loads_and_separates_corpus(self):
        """The committed verifier_default.model (the analog of the
        reference's shipped training_data_all.model) loads through the
        libsvm parser and separates its own multi-scale training corpus —
        in particular it must ACCEPT aligned examples from BOTH the
        bench-scale and the reference-scale measurement regimes (round-4's
        per-pair surrogate silently rejected out-of-regime scales)."""
        from lrr_tpu.verify import load_default_verifier, scale_measurements
        from lrr_tpu.verify.svm import DEFAULT_MODEL_PATH

        model = load_default_verifier()
        assert model.sv.shape[1] == 8
        assert model.sv.shape[0] >= 32

        corpus = np.load(
            DEFAULT_MODEL_PATH.replace(
                "verifier_default.model", "verifier_corpus.npz"
            ),
            allow_pickle=True,
        )
        for name in corpus["names"]:
            X = corpus[f"X_{name}"]
            y = corpus[f"y_{name}"]
            p = np.asarray(
                predict_probability(
                    model, scale_measurements(jnp.asarray(X))
                )
            )
            acc = float(((p > 0.5) == (y > 0)).mean())
            assert acc > 0.9, f"{name}: acc={acc}"
            if (y > 0).any():
                tpr = float((p[y > 0] > 0.5).mean())
                assert tpr > 0.9, f"{name}: tpr={tpr}"
