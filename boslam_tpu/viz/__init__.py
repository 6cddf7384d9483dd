from boslam_tpu.viz.viewer import render_map

__all__ = ["render_map"]
