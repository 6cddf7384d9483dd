from boslam_tpu.runtime.native import NativeLoader, available, decode_frame

__all__ = ["NativeLoader", "available", "decode_frame"]
