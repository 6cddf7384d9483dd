"""SLAM system orchestrator (reference slam.py / main.py, SURVEY.md §3.1).

The reference runs tracking / local-mapping / loop-closing as three Python
threads around a lock-protected map (SURVEY.md §2.3).  Here the map is an
immutable pytree and every stage is a pure jitted function, so the
orchestrator is a thin host loop that sequences device megafunctions and
reads back only decision scalars (keyframe? lost? loop?).  JAX's async
dispatch overlaps the host bookkeeping with device compute; the stage
decoupling of the reference survives as the ordering
    track -> insert/fuse/cull -> local BA -> place recognition -> pose graph
per keyframe event rather than as OS threads.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from boslam_tpu.config import SlamConfig
from boslam_tpu.features import extract_features
from boslam_tpu.features.frontend import rgb_to_gray
from boslam_tpu.geometry import se3
from boslam_tpu.loopclosure import (
    compute_bow, detect_loop, empty_loop_state, train_vocab, verify_loop,
)
from boslam_tpu.mapping import empty_map, map_ops
from boslam_tpu.solvers.local_ba import local_bundle_adjustment
from boslam_tpu.solvers.pose_graph import (
    add_loop_edge, apply_pose_correction, build_essential_edges,
    optimize_pose_graph,
)
from boslam_tpu.tracking import init_track_state, relocalize, track_frame
from boslam_tpu.tracking.tracker import ST_LOST, ST_OK, ST_UNINIT

VOCAB_TRAIN_AT_KF = 5  # train the online vocabulary once this many KFs exist

import functools


@functools.partial(jax.jit, static_argnums=(0,))
def _frame_megafn(cfg: SlamConfig, gray, depth, map_state, track_state):
    """One fused per-frame dispatch: extract + track + stat update + pose
    inverse.  Module-level with cfg static so the compiled executable is
    shared across SlamSystem instances (a per-instance closure would
    recompile the whole graph per instance — ~30 s on the remote TPU)."""
    feats = extract_features(gray, depth, cfg)
    new_track, out = track_frame(cfg, map_state, track_state, feats)
    new_map = map_ops.update_track_stats(
        cfg, map_state, out.visible, out.match_pt, out.match_ok
    )
    return feats, new_track, new_map, out, se3.pose_inv(new_track.pose_cw)


@functools.partial(jax.jit, static_argnums=(0,))
def _keyframe_megafn(cfg: SlamConfig, map_state, feats, pose_cw, match_pt,
                     match_ok, frame_idx):
    """Fused keyframe event: insert + fuse + cull points + local BA + cull
    one keyframe — one device dispatch, one packed stats readback."""
    st = map_ops.insert_keyframe(
        cfg, map_state, feats, pose_cw, match_pt, match_ok, frame_idx
    )
    kf_id = st.n_kf - 1
    st = map_ops.fuse_new_keyframe(cfg, st)
    st = map_ops.cull_points(cfg, st, update_covis=False)
    st, ba_stats = local_bundle_adjustment(cfg, st, kf_id)
    st = map_ops.cull_one_keyframe(cfg, st)
    stats = jnp.stack(
        [
            kf_id.astype(jnp.float32),
            ba_stats.cost0,
            ba_stats.cost1,
            ba_stats.n_edges.astype(jnp.float32),
        ]
    )
    return st, st.kf_pose[kf_id], stats


@functools.partial(jax.jit, static_argnums=(0,))
def _bow_detect_megafn(cfg: SlamConfig, loop_state, map_state, kf_id):
    """Fused BoW insert + loop detection; packed scalar verdict."""
    loop_state = compute_bow(cfg, loop_state, map_state, kf_id)
    loop_state, det = detect_loop(cfg, loop_state, map_state, kf_id)
    packed = jnp.stack(
        [det.candidate.astype(jnp.float32), det.score,
         det.consistent.astype(jnp.float32)]
    )
    return loop_state, packed


class SlamSystem:
    """Sequential RGBD SLAM engine over one camera stream."""

    def __init__(self, cfg: SlamConfig, seed: int = 0):
        self.cfg = cfg
        self.map = empty_map(cfg)
        self.loop = empty_loop_state(cfg)
        self.track = init_track_state()
        self.key = jax.random.key(seed)
        self.timestamps: List[float] = []
        self.poses_twc: List[np.ndarray] = []
        self.metrics: List[dict] = []
        self.n_loops_closed = 0


    # ------------------------------------------------------------------
    def process_frame(
        self, ts: float, rgb: np.ndarray, depth: np.ndarray
    ) -> np.ndarray:
        """Feed one RGBD frame; returns the current pose T_wc [7] (numpy)."""
        t0 = time.perf_counter()
        cfg = self.cfg
        status = int(self.track.status)
        rec = {"ts": ts, "status": status}
        gray = jnp.asarray(rgb_to_gray(rgb))
        depth_d = jnp.asarray(depth)

        if status == ST_UNINIT:
            feats = extract_features(gray, depth_d, cfg)
            self._initialize(feats)
            rec.update(event="init", n_inliers=0)
            pose_twc = np.asarray(se3.pose_inv(self.track.pose_cw))
        elif status == ST_LOST:
            feats = extract_features(gray, depth_d, cfg)
            self.key, k = jax.random.split(self.key)
            self.track, ok, n_inl = relocalize(cfg, self.map, self.track, feats, k)
            rec.update(event="relocalize", reloc_ok=bool(ok), n_inliers=int(n_inl))
            pose_twc = np.asarray(se3.pose_inv(self.track.pose_cw))
        else:
            feats, self.track, self.map, out, pose_twc_dev = _frame_megafn(
                cfg, gray, depth_d, self.map, self.track
            )
            # ONE packed readback for all host decisions + the pose.
            scalars, pose_twc = jax.device_get((out.scalars, pose_twc_dev))
            n_inl, n_match, n_vis, need_kf, lost = scalars
            rec.update(
                n_inliers=int(n_inl),
                n_matches=int(n_match),
                n_visible=int(n_vis),
                lost=bool(lost > 0.5),
            )
            if lost > 0.5:
                rec["event"] = "lost"
            elif need_kf > 0.5 and len(self._kf_ids()) < cfg.map.max_keyframes:
                self._keyframe_pipeline(feats, out, rec)
                pose_twc = np.asarray(se3.pose_inv(self.track.pose_cw))

        self.timestamps.append(ts)
        self.poses_twc.append(np.asarray(pose_twc))
        rec["dt_ms"] = (time.perf_counter() - t0) * 1e3
        self.metrics.append(rec)
        return np.asarray(pose_twc)

    def _kf_ids(self):
        if not hasattr(self, "_n_kf_host"):
            self._n_kf_host = int(self.map.n_kf)
        return range(self._n_kf_host)

    # ------------------------------------------------------------------
    def _initialize(self, feats):
        """Map init from the first RGBD frame: every depth-backed keypoint
        becomes a landmark (reference init_from_rgbd, §3.2)."""
        n = self.cfg.orb.n_features
        mp = jnp.full((n,), -1, jnp.int32)
        ok = jnp.zeros((n,), bool)
        self.map = map_ops.insert_keyframe(
            self.cfg, self.map, feats, se3.pose_identity(), mp, ok, 0
        )
        self._n_kf_host = 1
        self.track = self.track._replace(
            status=jnp.asarray(ST_OK, jnp.int32),
            frame_idx=self.track.frame_idx + 1,
        )

    # ------------------------------------------------------------------
    def _keyframe_pipeline(self, feats, out, rec):
        """Local-mapping + loop-closing work triggered by a new keyframe
        (reference §3.3 / §3.4, sequenced instead of threaded)."""
        cfg = self.cfg
        self.map, kf_pose, kf_stats = _keyframe_megafn(
            cfg, self.map, feats, out.pose_cw, out.match_pt, out.match_ok,
            self.track.frame_idx,
        )
        kf_idf, ba_cost0, ba_cost1, ba_edges = jax.device_get(kf_stats)
        kf_id = int(kf_idf)
        self._n_kf_host = kf_id + 1
        self.track = self.track._replace(
            last_kf=jnp.asarray(kf_id, jnp.int32),
            n_since_kf=jnp.zeros((), jnp.int32),
            pose_cw=kf_pose,
        )
        rec.update(
            event="keyframe",
            kf_id=kf_id,
            ba_cost0=float(ba_cost0),
            ba_cost1=float(ba_cost1),
            ba_edges=int(ba_edges),
        )

        # --- place recognition -----------------------------------------
        if not bool(self.loop.vocab_ready):
            if kf_id + 1 >= VOCAB_TRAIN_AT_KF:
                self.loop = train_vocab(cfg, self.loop, self.map)
            return
        self.loop, det_packed = _bow_detect_megafn(
            cfg, self.loop, self.map, jnp.asarray(kf_id)
        )
        candf, score, consistent = jax.device_get(det_packed)
        if consistent < 0.5:
            return
        cand = int(candf)
        self.key, k = jax.random.split(self.key)
        ok, t_rel, n_inl = verify_loop(
            cfg, self.map, jnp.asarray(kf_id), jnp.asarray(cand), k
        )
        rec.update(loop_candidate=cand, loop_inliers=int(n_inl))
        if not bool(ok):
            return
        self._close_loop(kf_id, cand, t_rel, rec)

    # ------------------------------------------------------------------
    def _close_loop(self, kf_id: int, cand: int, t_rel, rec):
        """Correct the loop (reference correct_loop + pose-graph, §3.4)."""
        cfg = self.cfg
        # Essential-graph measurements from pre-correction poses.
        edges = build_essential_edges(cfg, self.map)
        self.map = add_loop_edge(
            self.map, jnp.asarray(kf_id, jnp.int32), jnp.asarray(cand, jnp.int32),
            t_rel,
        )
        edges = edges._replace(
            i=jnp.concatenate([edges.i, jnp.asarray([kf_id], jnp.int32)]),
            j=jnp.concatenate([edges.j, jnp.asarray([cand], jnp.int32)]),
            t_meas=jnp.concatenate([edges.t_meas, t_rel[None]]),
            weight=jnp.concatenate([edges.weight, jnp.asarray([200.0])]),
            valid=jnp.concatenate([edges.valid, jnp.asarray([True])]),
        )
        # Rigidly pull the current keyframe onto the loop constraint as init.
        corrected = se3.pose_compose(t_rel, self.map.kf_pose[cand])
        old_poses = self.map.kf_pose
        init = old_poses.at[kf_id].set(corrected)
        K = old_poses.shape[0]
        fixed = jnp.zeros(K, bool).at[0].set(True).at[cand].set(True)
        new_poses = optimize_pose_graph(
            cfg, init, self.map.kf_valid, edges, fixed
        )
        self.map = apply_pose_correction(cfg, self.map, new_poses)
        self.track = self.track._replace(
            pose_cw=self.map.kf_pose[kf_id], velocity=se3.pose_identity()
        )
        self.n_loops_closed += 1
        rec["event"] = "loop_closed"

    # ------------------------------------------------------------------
    def trajectory(self):
        return np.asarray(self.timestamps), np.stack(self.poses_twc)

    @property
    def n_keyframes(self) -> int:
        return int(jnp.sum(self.map.kf_valid))

    @property
    def n_points(self) -> int:
        return int(jnp.sum(self.map.pt_valid))


def run_sequence(
    cfg: SlamConfig,
    frames,
    seed: int = 0,
    progress: bool = False,
) -> SlamSystem:
    """Run the engine over an iterable of (ts, rgb, depth)."""
    slam = SlamSystem(cfg, seed=seed)
    for i, (ts, rgb, depth) in enumerate(frames):
        slam.process_frame(ts, rgb, depth)
        if progress and i % 25 == 0:
            m = slam.metrics[-1]
            print(
                f"[{i}] kf={slam.n_keyframes} pts={slam.n_points} "
                f"inl={m.get('n_inliers', 0)} {m.get('event', '')}"
            )
    return slam
