from boslam_tpu.geometry import se3, camera, align

__all__ = ["se3", "camera", "align"]
