"""Pallas TPU kernels for the engine's hot ops (SURVEY.md §7.1 step 8).

Each kernel has a jnp reference implementation elsewhere in the package
(features/, matching/, solvers/); golden tests assert bit-exact or
tolerance-bounded agreement.  On non-TPU backends the wrappers fall back to
the jnp path so the CPU test suite and virtual-device meshes keep working.
"""

from boslam_tpu.ops.hamming_pallas import fused_match_top2

__all__ = ["fused_match_top2"]
