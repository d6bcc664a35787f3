"""Surrogate verifier for benches/tests.

The reference ships a pre-trained SVM (`training_data_all.model`) fitted to
labeled measurements from real CT registrations
(rrl/itkLocationRegistration.cxx:2088-2109); that file is not in the repo,
so benches and tests train a stand-in on synthetic measurement
distributions.

Ranges follow what actually discriminates alignment in the 8-vector
(max/min over directions of {weighted error, max transfer-covariance trace,
sheet angle, tube angle} — estimation/measurements.py): weighted errors and
angle disagreements separate aligned from misaligned; the covariance traces
scale with ROI geometry and feature count (hundreds at CT scale, tens on
64^3 phantoms), so BOTH classes draw them from the same wide range and the
classifier learns to ignore them — a surrogate trained with narrow trace
ranges silently rejects every candidate at a scale it wasn't tuned for.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from lrr_tpu.verify.svm import SvmModel, fit_rbf_classifier, scale_measurements


def surrogate_verifier(seed: int = 0, n: int = 128, steps: int = 200) -> SvmModel:
    rng = np.random.default_rng(seed)

    def cls(err_lo, err_hi, ang_lo, ang_hi):
        return np.concatenate(
            [
                rng.uniform(err_lo, err_hi, (n, 1)),       # max weighted error
                rng.uniform(0.1, 900.0, (n, 1)),           # max trace (scale-dep)
                rng.uniform(ang_lo, ang_hi, (n, 2)),       # max sheet/tube angle
                rng.uniform(0.8 * err_lo, 0.9 * err_hi, (n, 1)),  # min error
                rng.uniform(0.1, 800.0, (n, 1)),           # min trace (scale-dep)
                rng.uniform(0.9 * ang_lo, 0.9 * ang_hi, (n, 2)),  # min angles
            ],
            axis=1,
        ).astype(np.float32)

    aligned = cls(0.5, 1.3, 5.0, 28.0)
    misaligned = cls(1.8, 16.0, 33.0, 62.0)
    X = np.concatenate([aligned, misaligned])
    y = np.concatenate([np.ones(n), np.zeros(n)])
    Xs = np.asarray(scale_measurements(jnp.asarray(X)))
    return fit_rbf_classifier(Xs, y, steps=steps)
