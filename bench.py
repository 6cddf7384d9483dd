"""Benchmark harness: the BASELINE.json primary metrics on one chip.

Workload (no TUM data ships in this container — SURVEY.md §0):
1. **Tracking**: 200-frame deterministic synthetic RGBD loop trajectory at
   full TUM geometry (640x480, default engine config: 512 features, 8
   pyramid levels, 16k-point map, local BA on every keyframe, loop closure
   armed).  Reports tracked frames/s/chip + ATE RMSE.
2. **Global BA** (BASELINE config 4 scale): 256 keyframes x 50k landmarks x
   131k observations, matrix-free PCG Schur; reports LM iters/s on cached
   executables.
3. **Per-stage ms** (feature / track / local BA) on production shapes.

``vs_baseline`` honesty note: the reference publishes no numbers and its
mount is EMPTY (SURVEY.md §0/§6) so it was never measured; the denominator
is 30 fps — the ORB-SLAM-family real-time CPU tracking rate (PAPERS.md:9),
an UPPER BOUND on the pure-Python reference.  The ratio is therefore a
lower bound on the true speedup.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_FPS = 30.0  # ORB-SLAM family CPU rate — see module docstring.


def bench_tracking(args):
    import jax
    import jax.numpy as jnp

    from boslam_tpu.config import LoopConfig, SlamConfig, TrackerConfig
    from boslam_tpu.geometry import align
    from boslam_tpu.io import synthetic
    from boslam_tpu.slam import SlamSystem
    from boslam_tpu.utils.timing import stage_timings

    # Keyframe-heavy policy + armed loop closing (VERDICT r1 item 7): the
    # slow smooth orbit would otherwise yield too few keyframes for the
    # loop-detection gap/consistency machinery to engage.
    cfg = SlamConfig(
        loop=LoopConfig(min_gap_kf=8, consistency=2),
        tracker=TrackerConfig(kf_min_interval=2, kf_tracked_ratio=0.8),
    )
    if args.depth_stride is not None:
        import dataclasses

        cfg = cfg.replace(
            camera=dataclasses.replace(
                cfg.camera, depth_wire_stride=args.depth_stride
            )
        )

    traj = synthetic.orbit_trajectory(
        args.frames, radius=0.8, yaw_amplitude=0.4, loop=True
    )
    t0 = time.perf_counter()
    frames = synthetic.render_sequence(cfg.camera, traj)
    print(
        f"[bench] rendered {len(frames)} frames in "
        f"{time.perf_counter()-t0:.1f}s", file=sys.stderr,
    )

    # Warmup pass compiles every megafunction (fused frame step, vocab
    # training + refresh, loop verify, pose graph).
    t0 = time.perf_counter()
    warm = args.warmup_frames or args.frames
    slam = SlamSystem(cfg)
    for ts, rgb, depth in frames[:warm]:
        slam.feed(ts, rgb, depth)
    slam.flush()
    print(
        f"[bench] warmup ({warm} frames incl. compiles): "
        f"{time.perf_counter()-t0:.1f}s", file=sys.stderr,
    )

    # Measured pass: fresh engine state, cached executables.
    slam = SlamSystem(cfg)
    t0 = time.perf_counter()
    for ts, rgb, depth in frames:
        slam.feed(ts, rgb, depth)
    slam.flush()
    fps = len(frames) / (time.perf_counter() - t0)

    ts_arr, est = slam.trajectory()
    rmse, _ = align.ate_rmse(
        jnp.asarray(est[:, 4:]), jnp.asarray(traj.poses_twc[:, 4:])
    )
    n_lost = sum(1 for m in slam.metrics if m.get("lost", False))
    n_kf_events = sum(1 for m in slam.metrics if m.get("event") == "keyframe")
    print(
        f"[bench] fps={fps:.2f} ate_rmse={float(rmse):.4f}m "
        f"kf={slam.n_keyframes} (events={n_kf_events}) pts={slam.n_points} "
        f"lost={n_lost} loops={slam.n_loops_closed}", file=sys.stderr,
    )

    stages = {}
    if not args.no_stages:
        from boslam_tpu.features.frontend import rgb_to_gray

        _, rgb, depth = frames[len(frames) // 2]
        stages = stage_timings(slam, rgb_to_gray(rgb), depth)
        print(f"[bench] stages: " + " ".join(
            f"{k}={v:.4f}" if "util" in k else f"{k}={v:.2f}"
            for k, v in stages.items()), file=sys.stderr)

    return {
        "fps": round(fps, 3),
        "ate_rmse_m": round(float(rmse), 5),
        "keyframes": int(slam.n_keyframes),
        "map_points": int(slam.n_points),
        "loops_closed": int(slam.n_loops_closed),
        "lost_frames": n_lost,
        **{k: round(v, 4 if "util" in k else 2) for k, v in stages.items()},
    }


def bench_global_ba(args):
    """BASELINE config-4 scale: 50k landmarks, 131k observations."""
    import jax
    import jax.numpy as jnp

    from boslam_tpu.config import MapConfig, OrbConfig, SlamConfig
    from boslam_tpu.io.synthetic import synthetic_ba_problem
    from boslam_tpu.solvers.global_ba import global_bundle_adjustment

    cfg = SlamConfig(
        map=MapConfig(max_keyframes=256, max_points=65536),
        orb=OrbConfig(n_features=512),
    )
    rng = np.random.default_rng(0)
    st, gt_poses, _ = synthetic_ba_problem(
        cfg, rng, n_kf=256, n_pts=args.ba_points, obs_per_kf=512
    )
    lm_iters = 6
    run = lambda: global_bundle_adjustment(cfg, st, lm_iters=lm_iters,
                                           cg_iters=40)
    st2, stats = run()
    jax.block_until_ready(st2.kf_pose)  # compile
    t0 = time.perf_counter()
    st2, stats = run()
    jax.block_until_ready(st2.kf_pose)
    dt = time.perf_counter() - t0
    iters_per_s = lm_iters / dt
    from boslam_tpu.geometry import se3

    _, terr = se3.pose_distance(st2.kf_pose[:256], gt_poses)
    print(
        f"[bench] global BA: {int(stats.n_edges)} edges, "
        f"{int(jnp.sum(st.pt_valid))} pts, cost {float(stats.cost0):.0f}->"
        f"{float(stats.cost1):.0f}, {iters_per_s:.2f} LM iters/s, "
        f"max pose err {float(jnp.max(terr))*1e3:.1f}mm", file=sys.stderr,
    )
    return {
        "ba_iters_per_sec": round(iters_per_s, 3),
        "ba_landmarks": int(jnp.sum(st.pt_valid)),
        "ba_edges": int(stats.n_edges),
        "ba_cost_reduction": round(float(stats.cost0 / max(stats.cost1, 1e-9)), 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--warmup-frames", type=int, default=None)
    ap.add_argument("--ba-points", type=int, default=50000)
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    ap.add_argument("--no-stages", action="store_true")
    ap.add_argument("--no-global-ba", action="store_true")
    ap.add_argument("--depth-stride", type=int, default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"[bench] device: {jax.devices()[0]}", file=sys.stderr)

    extras = bench_tracking(args)
    if not args.no_global_ba:
        extras.update(bench_global_ba(args))

    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_sec_per_chip",
                "value": extras["fps"],
                "unit": "fps",
                # Denominator = 30 fps ORB-SLAM-family CPU rate; reference
                # itself unmeasured (mount empty) => this is a LOWER bound.
                "vs_baseline": round(extras["fps"] / BASELINE_FPS, 3),
                "baseline_note": "reference unmeasured (empty mount); "
                                 "denominator=30fps ORB-SLAM-family CPU rate",
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
