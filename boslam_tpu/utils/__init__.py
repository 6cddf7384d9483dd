from boslam_tpu.utils import checkpoint, metrics

__all__ = ["checkpoint", "metrics"]
