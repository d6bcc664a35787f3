from lrr_tpu.verify.svm import (
    SvmModel,
    REFERENCE_FEATURE_MAX,
    REFERENCE_FEATURE_MIN,
    fit_rbf_classifier,
    load_default_verifier,
    parse_libsvm_model,
    predict_probability,
    scale_measurements,
    serialize_libsvm_model,
)

__all__ = [
    "SvmModel",
    "REFERENCE_FEATURE_MAX",
    "REFERENCE_FEATURE_MIN",
    "fit_rbf_classifier",
    "load_default_verifier",
    "parse_libsvm_model",
    "predict_probability",
    "scale_measurements",
    "serialize_libsvm_model",
]
