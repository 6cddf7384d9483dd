"""Global BA (matrix-free PCG Schur) tests on a hand-built MapState."""

import numpy as np
import jax.numpy as jnp

from boslam_tpu.config import (
    CameraConfig, LocalBaConfig, MapConfig, OrbConfig, SlamConfig,
)
from boslam_tpu.geometry import camera as cam_mod
from boslam_tpu.geometry import se3
from boslam_tpu.mapping import empty_map
from boslam_tpu.solvers.global_ba import global_bundle_adjustment

CAM = CameraConfig(width=320, height=240, fx=130.0, fy=130.0, cx=160.0, cy=120.0)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=64, n_levels=3),
    map=MapConfig(max_keyframes=8, max_points=128),
)


def build_map(rng, n_kf=4, n_pts=60, perturb=0.0):
    """MapState with n_kf keyframes all observing n_pts exact points."""
    st = empty_map(CFG)
    pts = np.stack(
        [rng.uniform(-1.5, 2.0, n_pts), rng.uniform(-1.0, 1.0, n_pts),
         rng.uniform(2.0, 5.0, n_pts)], -1,
    ).astype(np.float32)
    gt_poses = []
    for k in range(n_kf):
        xi = np.zeros(6)
        xi[3] = 0.12 * k
        xi[1] = 0.04 * k
        gt_poses.append(np.asarray(se3.exp(jnp.asarray(xi))))
    gt_poses = np.array(gt_poses, np.float32)

    kf_pose = np.asarray(st.kf_pose).copy()
    kf_uv = np.asarray(st.kf_uv).copy()
    kf_depth = np.asarray(st.kf_depth).copy()
    kf_obs = np.asarray(st.kf_obs_pt).copy()
    kf_kpv = np.asarray(st.kf_kp_valid).copy()
    kf_valid = np.asarray(st.kf_valid).copy()
    for k in range(n_kf):
        xc = np.asarray(se3.pose_apply(jnp.asarray(gt_poses[k])[None], jnp.asarray(pts)))
        uv = np.asarray(cam_mod.project(CAM, jnp.asarray(xc)))
        kf_pose[k] = gt_poses[k]
        kf_uv[k, :n_pts] = uv
        kf_depth[k, :n_pts] = xc[:, 2]
        kf_obs[k, :n_pts] = np.arange(n_pts)
        kf_kpv[k, :n_pts] = True
        kf_valid[k] = True

    pt_xyz = np.asarray(st.pt_xyz).copy()
    pt_xyz[:n_pts] = pts
    pt_valid = np.asarray(st.pt_valid).copy()
    pt_valid[:n_pts] = True

    if perturb > 0:
        for k in range(1, n_kf):
            kf_pose[k] = np.asarray(
                se3.retract(jnp.asarray(kf_pose[k]), jnp.asarray(rng.normal(size=6) * perturb))
            )
        pt_xyz[:n_pts] += rng.normal(size=(n_pts, 3)).astype(np.float32) * perturb

    st = st._replace(
        kf_pose=jnp.asarray(kf_pose), kf_uv=jnp.asarray(kf_uv),
        kf_depth=jnp.asarray(kf_depth), kf_obs_pt=jnp.asarray(kf_obs),
        kf_kp_valid=jnp.asarray(kf_kpv), kf_valid=jnp.asarray(kf_valid),
        n_kf=jnp.asarray(n_kf, jnp.int32),
        pt_xyz=jnp.asarray(pt_xyz), pt_valid=jnp.asarray(pt_valid),
    )
    return st, jnp.asarray(gt_poses), jnp.asarray(pts), n_pts


def test_global_ba_zero_at_gt(rng):
    st, gt_poses, gt_pts, n_pts = build_map(rng, perturb=0.0)
    st2, stats = global_bundle_adjustment(CFG, st)
    assert float(stats.cost0) < 1e-2
    dr, dt = se3.pose_distance(st2.kf_pose[:4], gt_poses)
    assert float(jnp.max(dt)) < 1e-3


def test_global_ba_converges(rng):
    st, gt_poses, gt_pts, n_pts = build_map(rng, perturb=0.02)
    st2, stats = global_bundle_adjustment(CFG, st, lm_iters=8, cg_iters=60)
    assert float(stats.cost1) < 1e-2 * max(float(stats.cost0), 1.0), (
        float(stats.cost0), float(stats.cost1),
    )
    dr, dt = se3.pose_distance(st2.kf_pose[:4], gt_poses)
    assert float(jnp.max(dt)) < 2e-3
    err = jnp.linalg.norm(st2.pt_xyz[:n_pts] - gt_pts, axis=-1)
    assert float(jnp.max(err)) < 5e-3
    # KF0 is the gauge anchor and must not move.
    dr0, dt0 = se3.pose_distance(st2.kf_pose[0], st.kf_pose[0])
    assert float(dt0) < 1e-7


def test_global_ba_scale_synthetic(rng):
    """Config-4-in-miniature: the synthetic_ba_problem generator + global BA
    recover geometry at a few-thousand-landmark scale (the 50k/256-KF run is
    the bench; CI keeps shapes CPU-friendly)."""
    from boslam_tpu.io.synthetic import synthetic_ba_problem

    cfg = SlamConfig(
        camera=CAM,
        orb=OrbConfig(n_features=128, n_levels=3),
        map=MapConfig(max_keyframes=32, max_points=4096),
    )
    st, gt_poses, gt_pts = synthetic_ba_problem(
        cfg, rng, n_kf=24, n_pts=800, obs_per_kf=128, pose_noise=0.02
    )
    st2, stats = global_bundle_adjustment(cfg, st, lm_iters=6, cg_iters=40)
    assert float(stats.cost1) < 0.05 * float(stats.cost0)
    dr, dt = se3.pose_distance(st2.kf_pose[:24], gt_poses)
    dr0, dt0 = se3.pose_distance(st.kf_pose[:24], gt_poses)
    assert float(jnp.max(dt)) < 0.3 * float(jnp.max(dt0))


def test_point_sum_sorted_precision(rng):
    """The two-level-cumsum segment sum stays at per-segment-f32 accuracy
    at 131k-edge scale with realistic (octave-info-weighted) magnitudes
    (ADVICE r4: a single global f32 cumsum lost ~0.5% relative on late
    segments)."""
    from boslam_tpu.solvers.global_ba import _point_sum_sorted, _PtSchedule

    E, P = 131072, 50000
    pt = rng.integers(0, P, E)
    info = 1.2 ** (-2.0 * rng.integers(0, 8, size=(E, 1)))
    vals = (rng.normal(size=(E, 6)) * info).astype(np.float32)
    perm = np.argsort(pt, kind="stable")
    starts = np.searchsorted(pt[perm], np.arange(P)).astype(np.int32)
    ends = np.searchsorted(pt[perm], np.arange(P), side="right").astype(
        np.int32
    )
    sched = _PtSchedule(
        None, None, None, jnp.asarray(starts), jnp.asarray(ends)
    )
    out = np.asarray(_point_sum_sorted(sched, jnp.asarray(vals[perm])))
    ref = np.zeros((P, 6))
    np.add.at(ref, pt, vals.astype(np.float64))
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-30)
    assert rel[np.abs(ref) > 0.5].max() < 1e-4
