from boslam_tpu.mapping.map_state import MapState, empty_map
from boslam_tpu.mapping import map_ops

__all__ = ["MapState", "empty_map", "map_ops"]
