"""SVM verification of candidate alignments.

The reference vendors LIBSVM and loads a pre-trained RBF C-SVC with
probability outputs from `training_data_all.model`
(rrl/itkLocationRegistration.cxx:2085-2109, libsvm/svm_interface.cpp); each
8-d measurement vector is linearly rescaled to [-1, 1] with hard-coded
train-set min/max before prediction (svm_interface.cpp:44-51) and a
candidate is accepted iff P(aligned) > 0.5 (itkLocationRegistration
.cxx:2528).

This module provides the TPU-native equivalents:
  * `parse_libsvm_model` reads the standard libsvm text model format
    (2-class C-SVC, RBF) so the reference's trained verifier can be used
    directly for parity;
  * `predict_probability` evaluates the RBF decision function + Platt
    sigmoid as one batched JAX expression (a [Q, NSV] kernel matmul —
    trivial next to libsvm's per-vector loops);
  * `fit_rbf_classifier` replaces the offline svm-train/svm-scale tooling
    (libsvm/svm-train.cpp) with a JAX kernel-logistic-regression trainer
    producing the same model structure (every training point a support
    vector, Platt slope folded into the loss), so a verifier can be trained
    from labeled measurement vectors without any external dependency.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

# Hard-coded measurement scaling from the reference driver
# (itkLocationRegistration.cxx:2107-2109).
REFERENCE_FEATURE_MIN = np.array(
    [0.823246, 0.17355, 13.5656, 14.8583, 0.776814, 0.124, 10.3695, 13.049],
    np.float32,
)
REFERENCE_FEATURE_MAX = np.array(
    [16.1025, 139.276, 62.7776, 63.5239, 1.64664, 60.897, 59.8739, 60.8141],
    np.float32,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SvmModel:
    """2-class RBF classifier with probability outputs.

    Registered as a pytree so a model can be passed through jit boundaries
    as a runtime argument (closure-captured arrays are baked into the
    executable as constants and re-shipped on every dispatch)."""

    gamma: float
    rho: float
    sv: np.ndarray  # [N, D]
    sv_coef: np.ndarray  # [N]
    prob_a: float
    prob_b: float
    labels: tuple[int, int] = dataclasses.field(
        default=(1, -1), metadata={"static": True}
    )  # labels[0] is the "aligned" class


def scale_measurements(
    x: jax.Array,
    fmin: np.ndarray = REFERENCE_FEATURE_MIN,
    fmax: np.ndarray = REFERENCE_FEATURE_MAX,
) -> jax.Array:
    """Linear rescale to [-1, 1] (svm_interface.cpp:44-51).  No clamping —
    the reference doesn't clamp either."""
    fmin = jnp.asarray(fmin, x.dtype)
    fmax = jnp.asarray(fmax, x.dtype)
    return -1.0 + 2.0 * (x - fmin) / (fmax - fmin)


def decision_function(model: SvmModel, x: jax.Array) -> jax.Array:
    """f(x) = sum_i coef_i exp(-gamma ||x - sv_i||^2) - rho for x [..., D]."""
    sv = jnp.asarray(model.sv)
    coef = jnp.asarray(model.sv_coef)
    d2 = (
        jnp.sum(x * x, -1, keepdims=True)
        + jnp.sum(sv * sv, -1)[None, :]
        - 2.0 * x @ sv.T
    )
    k = jnp.exp(-model.gamma * jnp.maximum(d2, 0.0))
    return k @ coef - model.rho


def predict_probability(model: SvmModel, x: jax.Array) -> jax.Array:
    """P(labels[0] | x) via the Platt sigmoid (libsvm sigmoid_predict):
    p = 1 / (1 + exp(probA * f + probB)), numerically stabilized."""
    f = decision_function(model, x)
    fab = model.prob_a * f + model.prob_b
    return jnp.where(
        fab >= 0,
        jnp.exp(-fab) / (1.0 + jnp.exp(-fab)),
        1.0 / (1.0 + jnp.exp(fab)),
    )


def parse_libsvm_model(text: str) -> SvmModel:
    """Parse the libsvm text model format (svm.cpp svm_load_model) for
    2-class C-SVC / RBF with probability info."""
    lines = text.strip().splitlines()
    header: dict[str, str] = {}
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if line == "SV":
            break
        if not line:
            continue
        parts = line.split(None, 1)
        header[parts[0]] = parts[1] if len(parts) > 1 else ""

    if header.get("svm_type", "c_svc") != "c_svc":
        raise ValueError(f"unsupported svm_type {header.get('svm_type')}")
    if header.get("kernel_type", "rbf") != "rbf":
        raise ValueError(f"unsupported kernel {header.get('kernel_type')}")
    nr_class = int(header.get("nr_class", "2"))
    if nr_class != 2:
        raise ValueError("only 2-class models supported")

    gamma = float(header.get("gamma", "0.125"))
    rho = float(header["rho"].split()[0])
    labels = tuple(int(v) for v in header.get("label", "1 -1").split())
    prob_a = float(header.get("probA", "0").split()[0])
    prob_b = float(header.get("probB", "0").split()[0])
    total_sv = int(header["total_sv"])

    coefs = []
    vecs = []
    max_idx = 0
    raw = []
    for line in lines[i:]:
        line = line.strip()
        if not line:
            continue
        parts = line.split()
        coefs.append(float(parts[0]))
        pairs = []
        for p in parts[1:]:
            k, v = p.split(":")
            pairs.append((int(k), float(v)))
            max_idx = max(max_idx, int(k))
        raw.append(pairs)
    dim = max_idx + 1
    for pairs in raw:
        v = np.zeros(dim, np.float32)
        for k, val in pairs:
            v[k] = val
        vecs.append(v)
    sv = np.stack(vecs) if vecs else np.zeros((0, dim), np.float32)
    coef = np.asarray(coefs, np.float32)
    if len(coef) != total_sv:
        raise ValueError("SV count mismatch")
    return SvmModel(
        gamma=gamma, rho=rho, sv=sv, sv_coef=coef,
        prob_a=prob_a, prob_b=prob_b, labels=labels,
    )


def serialize_libsvm_model(model: SvmModel) -> str:
    """Inverse of parse_libsvm_model (svm.cpp svm_save_model format)."""
    out = [
        "svm_type c_svc",
        "kernel_type rbf",
        f"gamma {model.gamma:g}",
        "nr_class 2",
        f"total_sv {model.sv.shape[0]}",
        f"rho {model.rho:g}",
        f"label {model.labels[0]} {model.labels[1]}",
        f"probA {model.prob_a:g}",
        f"probB {model.prob_b:g}",
        f"nr_sv {model.sv.shape[0]} 0",
        "SV",
    ]
    for c, v in zip(model.sv_coef, model.sv):
        feats = " ".join(f"{i}:{x:g}" for i, x in enumerate(v))
        out.append(f"{c:g} {feats}")
    return "\n".join(out) + "\n"


DEFAULT_MODEL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "verifier_default.model",
)


def load_default_verifier(path: str = DEFAULT_MODEL_PATH) -> SvmModel:
    """The SHIPPED verifier — the analog of the reference's
    `training_data_all.model`, which is trained ONCE offline and loaded
    GT-free at serve time for every pair
    (rrl/itkLocationRegistration.cxx:2088-2109, libsvm/svm_interface.cpp).

    The committed file is produced by `scripts/train_default_verifier.py`
    on GT-labeled measurements from a multi-pair, multi-scale synthetic
    corpus (bench 64^3 pairs and reference-constants CT-scale pairs), so
    the measurement statistics of both serving regimes are in-distribution.
    `bench.py`, `cli register`, and `cli batch` load this by default;
    `calibrate_verifier` remains the documented tool for retraining on a
    new measurement regime."""
    with open(path) as f:
        return parse_libsvm_model(f.read())


def fit_rbf_classifier(
    X: np.ndarray,
    y: np.ndarray,  # 1 = aligned, 0/-1 = misaligned
    gamma: float = 0.125,
    l2: float = 1e-3,
    steps: int = 500,
    lr: float = 0.5,
) -> SvmModel:
    """Train a probabilistic RBF classifier (kernel logistic regression).

    Functional replacement for svm-train + Platt scaling: the decision
    function has the same form sum_i alpha_i K(x, sv_i) - rho and the
    probability map is the same sigmoid, so the result round-trips through
    the libsvm model format.  Unlike C-SVC the solution is dense (all
    training points are "support vectors"), which is irrelevant for the
    8-d / few-hundred-sample verification problem.
    """
    X = np.asarray(X, np.float32)
    yy = np.where(np.asarray(y) > 0, 1.0, -1.0).astype(np.float32)
    n = X.shape[0]

    # class-balanced weights: calibration sets are naturally imbalanced
    # (few aligned candidates among many refined ones) and an unweighted
    # mean loss biases the 0.5 threshold toward the majority class
    n_pos = max(int((yy > 0).sum()), 1)
    n_neg = max(int((yy < 0).sum()), 1)
    w = np.where(yy > 0, n / (2.0 * n_pos), n / (2.0 * n_neg)).astype(np.float32)

    Xj = jnp.asarray(X)
    yj = jnp.asarray(yy)
    wj = jnp.asarray(w)
    d2 = (
        jnp.sum(Xj * Xj, -1, keepdims=True)
        + jnp.sum(Xj * Xj, -1)[None, :]
        - 2.0 * Xj @ Xj.T
    )
    K = jnp.exp(-gamma * jnp.maximum(d2, 0.0))

    def loss(params):
        alpha, rho = params
        f = K @ alpha - rho
        # weighted logistic loss on margins; P(aligned) = sigmoid(f)
        return jnp.mean(wj * jnp.log1p(jnp.exp(-yj * f))) + l2 * alpha @ K @ alpha

    params = (jnp.zeros(n), jnp.asarray(0.0))
    g = jax.jit(jax.grad(loss))

    for _ in range(steps):
        ga, gr = g(params)
        params = (params[0] - lr * ga, params[1] - lr * gr)

    alpha, rho = params
    # Platt slope of -1 reproduces P = sigmoid(f) through the libsvm-style
    # sigmoid p = 1/(1+exp(A f + B))
    return SvmModel(
        gamma=gamma,
        rho=float(rho),
        sv=X,
        sv_coef=np.asarray(alpha, np.float32),
        prob_a=-1.0,
        prob_b=0.0,
        labels=(1, -1),
    )
