from boslam_tpu.loopclosure.vocab import LoopState, empty_loop_state, train_vocab, compute_bow
from boslam_tpu.loopclosure.detect import (
    detect_loop, verify_loop, verify_loops_batch, LoopDetection,
)

__all__ = [
    "LoopState", "empty_loop_state", "train_vocab", "compute_bow",
    "detect_loop", "verify_loop", "verify_loops_batch", "LoopDetection",
]
