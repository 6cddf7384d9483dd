"""Checkpoint round-trip + metrics summarization tests (SURVEY.md §5.4/5.5)."""

import json

import numpy as np
import jax.numpy as jnp

from boslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from boslam_tpu.io import synthetic
from boslam_tpu.slam import SlamSystem
from boslam_tpu.utils import checkpoint as ckpt
from boslam_tpu.utils.metrics import dump_metrics, summarize

CAM = CameraConfig(width=160, height=120, fx=70.0, fy=70.0, cx=80.0, cy=60.0)
CFG = SlamConfig(camera=CAM, orb=OrbConfig(n_features=128, n_levels=3))


def test_checkpoint_roundtrip(tmp_path):
    traj = synthetic.orbit_trajectory(8, radius=0.3)
    frames = synthetic.render_sequence(CAM, traj)
    slam = SlamSystem(CFG)
    for ts, rgb, depth in frames:
        slam.process_frame(ts, rgb, depth)
    # A synthetic cull-chain record exercises the non-empty save path
    # (orbax refuses zero-size arrays, so empty chains are omitted).
    slam.cull_chain[(3, 3)] = (0, 0, np.asarray(
        [1.0, 0, 0, 0, 0.1, 0.2, 0.3], np.float32))

    path = str(tmp_path / "ckpt")
    ckpt.save(path, slam)

    slam2 = SlamSystem(CFG)
    ckpt.restore(path, slam2)
    assert slam2.n_keyframes == slam.n_keyframes
    assert slam2.n_points == slam.n_points
    assert (3, 3) in slam2.cull_chain
    np.testing.assert_allclose(
        slam2.cull_chain[(3, 3)][2], slam.cull_chain[(3, 3)][2], atol=1e-7
    )
    assert slam2.cull_chain[(3, 3)][:2] == (0, 0)
    np.testing.assert_array_equal(
        np.asarray(slam2.map.kf_pose), np.asarray(slam.map.kf_pose)
    )
    np.testing.assert_allclose(
        np.stack(slam2.poses_twc), np.stack(slam.poses_twc), atol=1e-7
    )

    # Resumed engine keeps tracking.
    more = synthetic.render_sequence(
        CAM, synthetic.orbit_trajectory(10, radius=0.3)
    )
    slam2.process_frame(*more[-1])
    assert not slam2.metrics[-1].get("lost", False)


def test_metrics_summary(tmp_path):
    metrics = [
        {"ts": 0.0, "event": "init", "dt_ms": 5.0},
        {"ts": 0.1, "n_inliers": 50, "dt_ms": 7.0},
        {"ts": 0.2, "n_inliers": 60, "event": "keyframe", "dt_ms": 9.0},
        {"ts": 0.3, "n_inliers": 10, "lost": True, "dt_ms": 6.0},
    ]
    s = summarize(metrics)
    assert s["n_frames"] == 4
    assert s["n_lost"] == 1
    assert s["mean_inliers"] == 40.0
    p = tmp_path / "m.jsonl"
    dump_metrics(str(p), metrics)
    lines = [json.loads(line) for line in open(p)]
    assert len(lines) == 4 and lines[2]["event"] == "keyframe"


def test_viewer_renders_png(tmp_path):
    """viz.render_map produces a non-trivial PNG from a live MapState."""
    import numpy as np
    import jax.numpy as jnp

    from boslam_tpu.config import SlamConfig, MapConfig, OrbConfig
    from boslam_tpu.mapping import empty_map
    from boslam_tpu.viz import render_map

    cfg = SlamConfig(map=MapConfig(max_keyframes=8, max_points=256),
                     orb=OrbConfig(n_features=64))
    st = empty_map(cfg)
    rng = np.random.default_rng(0)
    st = st._replace(
        pt_xyz=jnp.asarray(rng.uniform(-1, 1, (256, 3)).astype(np.float32)),
        pt_valid=jnp.ones(256, bool),
        kf_valid=st.kf_valid.at[0].set(True),
    )
    traj = np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (5, 1))
    traj[:, 4] = np.linspace(0, 1, 5)
    out = render_map(st, trajectory=traj, out_path=str(tmp_path / "m.png"))
    import os

    assert os.path.getsize(out) > 10000


def test_checkpoint_restore_fills_missing_fields(tmp_path):
    """A snapshot written before a MapState field existed must restore with
    that field at its empty_map default instead of raising (advisor r2)."""
    import orbax.checkpoint as ocp

    traj = synthetic.orbit_trajectory(6, radius=0.3)
    frames = synthetic.render_sequence(CAM, traj)
    slam = SlamSystem(CFG)
    for ts, rgb, depth in frames:
        slam.process_frame(ts, rgb, depth)
    path = str(tmp_path / "ckpt_old")
    ckpt.save(path, slam)

    # Rewrite the snapshot minus a map field (simulating an old version).
    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(path)
    state = dict(state)
    state["map"] = {k: v for k, v in dict(state["map"]).items() if k != "kf_seq"}
    path2 = str(tmp_path / "ckpt_new")
    ckptr.save(path2, state, force=True)

    slam2 = SlamSystem(CFG)
    ckpt.restore(path2, slam2)  # must not raise
    assert slam2.n_keyframes == slam.n_keyframes
    # Missing field came back as the empty-map default.
    assert int(jnp.max(slam2.map.kf_seq)) == -1


def test_checkpoint_restore_rejects_mismatched_capacities(tmp_path):
    """Restoring a snapshot written under a different SlamConfig (different
    map capacities) must fail loudly — not silently reset the map arrays to
    empty while scalars load (advisor r3)."""
    import dataclasses

    import pytest

    traj = synthetic.orbit_trajectory(6, radius=0.3)
    frames = synthetic.render_sequence(CAM, traj)
    slam = SlamSystem(CFG)
    for ts, rgb, depth in frames:
        slam.process_frame(ts, rgb, depth)
    path = str(tmp_path / "ckpt_cap")
    ckpt.save(path, slam)

    other = CFG.replace(
        map=dataclasses.replace(CFG.map, max_keyframes=CFG.map.max_keyframes * 2)
    )
    slam2 = SlamSystem(other)
    with pytest.raises(ValueError, match="shape"):
        ckpt.restore(path, slam2)


def test_config_from_yaml(tmp_path):
    """YAML config loading (SURVEY.md §5.6): sections override the base
    preset, capacities included; unknown keys raise."""
    import pytest

    from boslam_tpu.config import SlamConfig, TUM_FR2

    p = tmp_path / "cfg.yaml"
    p.write_text(
        "map:\n  max_keyframes: 64\n  max_points: 4096\n"
        "orb:\n  n_features: 256\n"
        "camera:\n  fx: 333.0\n"
    )
    cfg = SlamConfig.from_yaml(str(p), base=SlamConfig(camera=TUM_FR2))
    assert cfg.map.max_keyframes == 64
    assert cfg.map.max_points == 4096
    assert cfg.orb.n_features == 256
    assert cfg.camera.fx == 333.0
    # Non-overridden fields keep the base preset's values.
    assert cfg.camera.fy == TUM_FR2.fy
    assert cfg.orb.n_levels == 8

    bad = tmp_path / "bad.yaml"
    bad.write_text("mapp:\n  max_keyframes: 64\n")
    with pytest.raises(ValueError, match="unknown config sections"):
        SlamConfig.from_yaml(str(bad))

    bad2 = tmp_path / "bad2.yaml"
    bad2.write_text("map:\n  max_keyframez: 64\n")
    with pytest.raises(TypeError):
        SlamConfig.from_yaml(str(bad2))


def test_tensorboard_scalar_export(tmp_path):
    """SURVEY §5.5 'JSONL + TensorBoard scalars' (VERDICT r4 item 5): the
    metric records mirror to a TensorBoard event file that the tensorboard
    loader reads back with the expected tags."""
    from boslam_tpu.utils.metrics import export_tensorboard

    metrics = [
        {"ts": 0.0, "event": "init", "dt_ms": 5.0},
        {"ts": 0.1, "n_inliers": 50, "n_matches": 80, "dt_ms": 7.0},
        {"ts": 0.2, "n_inliers": 60, "event": "keyframe",
         "ba_cost0": 9.0, "ba_cost1": 3.0, "dt_ms": 9.0},
        {"ts": 0.3, "n_inliers": 10, "lost": True, "dt_ms": 6.0},
    ]
    logdir = str(tmp_path / "tb")
    export_tensorboard(logdir, metrics)
    import glob as _glob
    import os as _os

    files = _glob.glob(_os.path.join(logdir, "events.out.tfevents.*"))
    assert len(files) == 1
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )

    evs = list(EventFileLoader(files[0]).Load())
    by_tag = {}
    for e in evs:
        for v in (e.summary.value if e.summary else []):
            # TB 2.x writers migrate simple_value into tensor form.
            val = (
                v.tensor.float_val[0]
                if v.HasField("tensor") else v.simple_value
            )
            by_tag.setdefault(v.tag, []).append((e.step, val))
    assert by_tag["frame/n_inliers"] == [(1, 50.0), (2, 60.0), (3, 10.0)]
    assert (2, 1.0) in by_tag["event/keyframe"]
    assert (3, 1.0) in by_tag["event/lost"]
    assert (1, 0.0) in by_tag["event/lost"]
