"""Benchmark harness: tracked frames/sec/chip on a synthetic RGBD sequence.

Primary metric per BASELINE.json: "tracked frames/sec/chip + ATE RMSE (m)".
No TUM data ships in this container, so the workload is the deterministic
synthetic room at full TUM geometry (640x480, default engine config: 512
features, 8 pyramid levels, 16k-point map, local BA on every keyframe).

``vs_baseline``: the reference publishes no numbers and its mount is empty
(SURVEY.md §0/§6); the denominator used here is 30 fps — the ORB-SLAM-family
real-time tracking rate on desktop CPU (PAPERS.md:9), an upper bound on the
pure-Python reference.  BASELINE target is >= 10x the reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_FPS = 30.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--warmup-frames", type=int, default=None)
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    ap.add_argument(
        "--depth-stride", type=int, default=None,
        help="override camera.depth_wire_stride (wire-format A/B testing)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from boslam_tpu.config import SlamConfig
    from boslam_tpu.geometry import align
    from boslam_tpu.io import synthetic
    from boslam_tpu.slam import SlamSystem

    cfg = SlamConfig()
    if args.depth_stride is not None:
        import dataclasses

        cfg = cfg.replace(
            camera=dataclasses.replace(
                cfg.camera, depth_wire_stride=args.depth_stride
            )
        )
    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)

    traj = synthetic.orbit_trajectory(args.frames, radius=0.5, yaw_amplitude=0.25)
    t0 = time.perf_counter()
    frames = synthetic.render_sequence(cfg.camera, traj)
    print(
        f"[bench] rendered {len(frames)} frames in {time.perf_counter()-t0:.1f}s",
        file=sys.stderr,
    )

    # Warmup pass: compile every megafunction (the fused frame step, vocab
    # training, loop machinery) once.
    t0 = time.perf_counter()
    warm = args.warmup_frames or args.frames
    slam = SlamSystem(cfg)
    for ts, rgb, depth in frames[:warm]:
        slam.feed(ts, rgb, depth)
    slam.flush()
    print(
        f"[bench] warmup ({warm} frames incl. compiles): "
        f"{time.perf_counter()-t0:.1f}s",
        file=sys.stderr,
    )

    # Measured pass: fresh engine state, cached executables.  Frames are
    # async-dispatched in chunks; stats come back one packed readback per
    # chunk (per-frame readbacks over the device tunnel would dominate).
    slam = SlamSystem(cfg)
    t0 = time.perf_counter()
    for ts, rgb, depth in frames:
        slam.feed(ts, rgb, depth)
    slam.flush()
    elapsed = time.perf_counter() - t0
    fps = len(frames) / elapsed

    ts_arr, est = slam.trajectory()
    rmse, _ = align.ate_rmse(
        jnp.asarray(est[:, 4:]), jnp.asarray(traj.poses_twc[:, 4:])
    )
    n_lost = sum(1 for m in slam.metrics if m.get("lost", False))
    print(
        f"[bench] fps={fps:.2f} ate_rmse={float(rmse):.4f}m "
        f"kf={slam.n_keyframes} pts={slam.n_points} lost={n_lost} "
        f"loops={slam.n_loops_closed}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_sec_per_chip",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
