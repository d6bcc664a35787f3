from lrr_tpu.features.extract import detect_features, extract_keypoints

__all__ = ["detect_features", "extract_keypoints"]
