from boslam_tpu.io import tum, synthetic

__all__ = ["tum", "synthetic"]
