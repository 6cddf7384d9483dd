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


# Peak device rates for utilization reporting (per chip).  v5e ("TPU v5
# lite"): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.  Utilization is reported
# against the bf16 peak — the engine's hot matmuls run f32/bf16-mixed, so
# the number is a conservative MFU-style fraction.
_DEVICE_PEAKS = {
    "tpu v5 lite": (197e12, 819e9),
    "tpu v5e": (197e12, 819e9),
    "tpu v4": (275e12, 1228e9),
    "tpu v6 lite": (918e12, 1640e9),
}


def device_peaks():
    """(peak_flops_per_s, peak_hbm_bytes_per_s) of device 0, or None."""
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in _DEVICE_PEAKS.items():
        if key in kind:
            return peaks
    return None


def _cost_analysis(lowerable, *args):
    """XLA-estimated (flops, bytes accessed) of a jitted fn at args."""
    try:
        c = lowerable.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))
    except Exception:
        return None


def stage_timings(slam, gray: np.ndarray, depth: np.ndarray,
                  repeats: int = 10) -> Dict[str, float]:
    """Median ms per pipeline stage using ``slam``'s live map/track state,
    plus utilization: XLA-estimated FLOPs and HBM bytes per stage divided
    by measured time and the chip's peak rates (VERDICT r2 item 8 — fps
    claims are utilization-grounded, not just wall-clock).

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

    stages = {
        "feature": (
            lambda: extract_features(g, d, cfg),
            (extract_features, (g, d, cfg)),
        ),
        "track": (
            lambda: track_frame(cfg, slam.map, slam.track, feats),
            (track_frame, (cfg, slam.map, slam.track, feats)),
        ),
        "local_ba": (
            lambda: local_bundle_adjustment(cfg, slam.map, center),
            (local_bundle_adjustment, (cfg, slam.map, center)),
        ),
    }
    peaks = device_peaks()
    out = {}
    for name, (run, (jitted, args)) in stages.items():
        ms = _time_fn(run, repeats=repeats)
        out[f"{name}_ms"] = ms
        cost = _cost_analysis(jitted, *args)
        if cost is not None and peaks is not None and ms > 0:
            flops, nbytes = cost
            peak_f, peak_b = peaks
            out[f"{name}_util_flops"] = flops / (ms * 1e-3) / peak_f
            out[f"{name}_util_hbm"] = nbytes / (ms * 1e-3) / peak_b
    return out
