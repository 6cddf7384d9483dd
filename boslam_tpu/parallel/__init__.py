from boslam_tpu.parallel.mesh import make_mesh
from boslam_tpu.parallel import sharded_ba, batch

__all__ = ["make_mesh", "sharded_ba", "batch"]
