"""Device cost of each keyframe-event map operation on LIVE engine state.

The fused-step scan harness (utils/timing.fused_step_device_ms) measures a
steady-state stream in which keyframe events are rare (the repeated frame
re-tracks perfectly, so only kf_max_interval forces events); the live
engine at a dense keyframe policy pays the event chain every few frames.
This tool times each event op scan-chained on a real mid-sequence map so
the per-frame budget can be reconstructed honestly:

    avg ms/frame = track_frame + event_fraction * (sum of event ops)

Usage: python tools/kf_event_cost.py [--frames 160]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--scan-len", type=int, default=12)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from boslam_tpu.config import (
        CameraConfig, LoopConfig, SlamConfig, TrackerConfig,
    )
    from boslam_tpu.io import synthetic
    from boslam_tpu.slam import SlamSystem, depth_wire, to_gray_u8
    from boslam_tpu.mapping import map_ops
    from boslam_tpu.mapping.map_state import latest_kf_slot, recompute_covis
    from boslam_tpu.solvers.local_ba import local_bundle_adjustment

    cam = CameraConfig(fx=260.0, fy=260.0, cx=319.5, cy=239.5,
                       depth_max=20.0, depth_wire_stride=2)
    cfg = SlamConfig(
        camera=cam, loop=LoopConfig(min_gap_kf=8, consistency=2),
        tracker=TrackerConfig(kf_min_interval=2, kf_tracked_ratio=0.8),
    )
    print(f"device: {jax.devices()[0]}", flush=True)
    traj = synthetic.clover_trajectory(args.frames, n_petals=3, radius=2.5,
                                       yaw_amplitude=0.4)
    frames = [
        (ts, to_gray_u8(r), depth_wire(d, cam)) for ts, r, d in
        synthetic.render_sequence(cam, traj, depth_noise=0.025, seed=3,
                                  room_scale=2.5)
    ]
    slam = SlamSystem(cfg)
    for f in frames:
        slam.feed(*f)
    slam.flush()
    st = slam.map
    kf = latest_kf_slot(st)
    print(f"state: kf={slam.n_keyframes} pts={slam.n_points}", flush=True)

    total = 0.0

    def timed(name, op):
        nonlocal total
        length = args.scan_len

        @jax.jit
        def jc(s, salt):
            def body(c, _):
                return op(c._replace(kf_pose=c.kf_pose + salt * 1e-30)), None
            out, _ = jax.lax.scan(body, s, None, length=length)
            return out.kf_pose

        np.asarray(jc(st, np.float32(0)))  # compile + settle
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(jc(st, np.float32(i + 1)))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / length * 1e3
        total += ms
        print(f"{name:22s} {ms:7.2f} ms", flush=True)

    timed("recompute_covis", lambda s: recompute_covis(s))
    timed("fuse_new_keyframe", lambda s: map_ops.fuse_new_keyframe(cfg, s, kf))
    timed("refresh_point_model",
          lambda s: map_ops.refresh_point_model(cfg, s, kf))
    timed("cull_points",
          lambda s: map_ops.cull_points(cfg, s, update_covis=False))
    timed("cull_one_keyframe", lambda s: map_ops.cull_one_keyframe(cfg, s)[0])
    timed("local_ba", lambda s: local_bundle_adjustment(cfg, s, kf)[0])
    print(f"{'EVENT TOTAL':22s} {total:7.2f} ms (excl. insert/BoW/detect)",
          flush=True)


if __name__ == "__main__":
    main()
