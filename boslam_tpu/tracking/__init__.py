from boslam_tpu.tracking.tracker import TrackState, TrackOut, init_track_state, track_frame, relocalize

__all__ = ["TrackState", "TrackOut", "init_track_state", "track_frame", "relocalize"]
