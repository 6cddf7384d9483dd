from boslam_tpu.parallel.mesh import make_mesh
from boslam_tpu.parallel import batch, sharded_ba

__all__ = ["make_mesh", "batch", "sharded_ba", "multi", "sharded_global_ba"]


def __getattr__(name):
    # Lazy: multi / sharded_global_ba import the full engine stack.
    if name in ("multi", "sharded_global_ba"):
        import importlib

        return importlib.import_module(f"boslam_tpu.parallel.{name}")
    raise AttributeError(name)
