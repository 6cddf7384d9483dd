"""Per-stage timing harness (SURVEY.md §5.1: per-kernel timing via
``jax.block_until_ready`` micro-harness).

Times each pipeline stage on PRODUCTION shapes against live engine state —
feature extraction, frame-to-map tracking (matching + motion-only BA), local
bundle adjustment, and the fused whole-frame step — so optimization work
(e.g. Pallas kernels) is measured, not guessed.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _time_fn(fn, *args, repeats: int = 10, warmup: int = 2,
             chain: int = 8) -> float:
    """Amortized wall ms of ``fn(*args)``: ``chain`` async dispatches per
    sync (the engine overlaps dispatch exactly like this, and a sync per
    call would measure the host<->device round trip, not the kernel)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    out = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = None
        for _ in range(chain):
            r = fn(*args)
        jax.block_until_ready(r)
        out.append((time.perf_counter() - t0) * 1e3 / chain)
    return float(np.median(out))


def stage_timings(slam, gray: np.ndarray, depth: np.ndarray,
                  repeats: int = 10) -> Dict[str, float]:
    """Median ms per pipeline stage using ``slam``'s live map/track state.

    Args:
      slam: a SlamSystem that has processed frames (map populated).
      gray: [H, W] f32 grayscale frame; depth: [H, W] f32 metres.
    """
    from boslam_tpu.features import extract_features
    from boslam_tpu.mapping.map_state import latest_kf_slot
    from boslam_tpu.solvers.local_ba import local_bundle_adjustment
    from boslam_tpu.tracking.tracker import track_frame

    cfg = slam.cfg
    g = jnp.asarray(gray)
    d = jnp.asarray(depth)
    feats = extract_features(g, d, cfg)
    jax.block_until_ready(feats.uv)
    center = latest_kf_slot(slam.map)

    out = {}
    out["feature_ms"] = _time_fn(
        lambda: extract_features(g, d, cfg), repeats=repeats
    )
    out["track_ms"] = _time_fn(
        lambda: track_frame(cfg, slam.map, slam.track, feats), repeats=repeats
    )
    out["local_ba_ms"] = _time_fn(
        lambda: local_bundle_adjustment(cfg, slam.map, center), repeats=repeats
    )
    return out
