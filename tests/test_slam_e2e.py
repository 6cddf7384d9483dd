"""End-to-end SLAM tests: full pipeline with local BA on a synthetic sequence,
and loop-closure detection + pose-graph correction on a loop trajectory
(SURVEY.md §4.2.4 and BASELINE configs 1-3 in miniature)."""

import numpy as np
import pytest
import jax.numpy as jnp

from boslam_tpu.config import (
    CameraConfig, LoopConfig, MapConfig, OrbConfig, SlamConfig, TrackerConfig,
)
from boslam_tpu.geometry import align
from boslam_tpu.io import synthetic
from boslam_tpu.slam import run_sequence

CAM = CameraConfig(width=320, height=240, fx=130.0, fy=130.0, cx=160.0, cy=120.0)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=256, n_levels=4),
    loop=LoopConfig(min_gap_kf=6, consistency=2),
)


@pytest.fixture(scope="module")
def orbit_run():
    traj = synthetic.orbit_trajectory(40, radius=0.5, yaw_amplitude=0.2)
    frames = synthetic.render_sequence(CAM, traj)
    slam = run_sequence(CFG, frames)
    return traj, slam


def test_e2e_ate_with_local_ba(orbit_run):
    traj, slam = orbit_run
    ts, est = slam.trajectory()
    assert est.shape[0] == 40
    rmse, _ = align.ate_rmse(
        jnp.asarray(est[:, 4:]), jnp.asarray(traj.poses_twc[:, 4:])
    )
    assert float(rmse) < 0.015, f"ATE {float(rmse):.4f} m"
    assert not any(m.get("lost", False) for m in slam.metrics)


def test_e2e_map_health(orbit_run):
    _, slam = orbit_run
    assert slam.n_keyframes >= 3
    assert slam.n_points > 100
    # BA ran and reduced cost on at least one keyframe event.
    kf_events = [m for m in slam.metrics if m.get("event") == "keyframe"]
    assert kf_events
    assert any(m["ba_cost1"] <= m["ba_cost0"] for m in kf_events)


def test_e2e_metrics_recorded(orbit_run):
    _, slam = orbit_run
    assert len(slam.metrics) == 40
    assert all("dt_ms" in m for m in slam.metrics)


@pytest.mark.slow
def test_loop_closure_fires():
    """A closed-loop trajectory must produce a detected + verified loop and
    a pose-graph correction that keeps the end-of-loop error small."""
    traj = synthetic.orbit_trajectory(80, radius=1.2, yaw_amplitude=0.5, loop=True)
    frames = synthetic.render_sequence(CAM, traj)
    cfg = CFG.replace(
        loop=LoopConfig(min_gap_kf=8, consistency=2, min_score_matches=25),
        tracker=TrackerConfig(kf_min_interval=2, kf_tracked_ratio=0.75),
    )
    slam = run_sequence(cfg, frames)
    ts, est = slam.trajectory()
    rmse, _ = align.ate_rmse(
        jnp.asarray(est[:, 4:]), jnp.asarray(traj.poses_twc[:, 4:])
    )
    # The run must stay tracked; the loop should close and the ATE stay small.
    assert not any(m.get("lost", False) for m in slam.metrics)
    assert float(rmse) < 0.05, f"ATE {float(rmse):.4f} m"
    assert slam.n_loops_closed >= 1, "no loop closure fired"


def test_global_ba_hook(orbit_run):
    """SlamSystem.run_global_ba (reference optional post-loop global BA,
    §3.4) runs on live engine state and does not increase the map cost."""
    import copy

    _, slam = orbit_run
    rec = slam.run_global_ba()
    assert rec["gba_edges"] > 100
    assert rec["gba_cost1"] <= rec["gba_cost0"] * 1.01
