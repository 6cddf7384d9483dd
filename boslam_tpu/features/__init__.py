from boslam_tpu.features.frontend import FrameFeatures, extract_features

__all__ = ["FrameFeatures", "extract_features"]
