"""Distribution layer: meshes, sharded BA, multi-sequence DP, multi-host
runtime.

Everything is lazy: ``jax.distributed.initialize()`` (parallel/distributed)
must run BEFORE any jax call that initializes the XLA backend, and several
submodules create jnp constants at import time — an eager import here would
close the multi-host bootstrap window for every ``import boslam_tpu``.
"""

__all__ = [
    "make_mesh", "sharded_ba", "multi", "sharded_global_ba",
    "mesh", "distributed",
]

_SUBMODULES = ("sharded_ba", "multi", "sharded_global_ba",
               "mesh", "distributed")


def __getattr__(name):
    import importlib

    if name == "make_mesh":
        return importlib.import_module("boslam_tpu.parallel.mesh").make_mesh
    if name in _SUBMODULES:
        return importlib.import_module(f"boslam_tpu.parallel.{name}")
    raise AttributeError(name)
