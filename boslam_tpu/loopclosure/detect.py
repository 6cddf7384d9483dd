"""Loop detection: BoW candidate retrieval, temporal consistency, geometric
verification (reference loop_closing.py, SURVEY.md §2.1/§3.4).

Candidate scoring is a dense BoW matmul over all keyframes with masks for
covisible neighbors and recency; the covisibility-neighborhood minimum score
is the adaptive baseline, exactly the reference's policy.  Verification is
descriptor matching + 3D-3D SE3 RANSAC on keypoint backprojections (RGBD =>
scale-1 SE3, reference compute_se3()).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from boslam_tpu.config import SlamConfig
from boslam_tpu.geometry import camera as cam_mod
from boslam_tpu.loopclosure.vocab import LoopState
from boslam_tpu.matching import hamming
from boslam_tpu.matching.rotation import rotation_consistency
from boslam_tpu.solvers import optimize_pose, ransac_se3


class LoopDetection(NamedTuple):
    candidate: jnp.ndarray  # scalar i32 keyframe id (-1 = none)
    score: jnp.ndarray      # scalar f32 BoW similarity
    consistent: jnp.ndarray # scalar bool (passed temporal consistency)


@functools.partial(jax.jit, static_argnums=(0,))
def detect_loop(cfg: SlamConfig, loop: LoopState, map_state, kf_id):
    """Score keyframes against ``kf_id``; returns (LoopState, LoopDetection)."""
    lc = cfg.loop
    K = loop.kf_bow.shape[0]
    scores = loop.kf_bow @ loop.kf_bow[kf_id]           # [K]
    covis_row = map_state.covis[kf_id]
    neighbors = (covis_row >= cfg.map.covis_min_weight) & map_state.kf_valid
    # Baseline: worst similarity among covisible neighbors (reference policy).
    min_score = jnp.min(jnp.where(neighbors, scores, jnp.inf))
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 0.1)
    cand_mask = (
        map_state.kf_valid
        # Insertion-order gap, not slot-id gap: slots are free-list reused.
        & (map_state.kf_seq <= map_state.kf_seq[kf_id] - lc.min_gap_kf)
        & ~neighbors
        & (jnp.arange(K) != kf_id)
        & loop.vocab_ready
        & (scores >= jnp.maximum(min_score, 0.02))
    )
    # Top-C candidates with PARALLEL consistency streaks (reference
    # mvConsistentGroups): a genuine revisit must keep building its streak
    # even when an aliased-texture candidate outscores it on individual
    # keyframes, so the single-argmax streak is not enough.
    C = loop.streak_kf.shape[0]
    svals, sidx = jax.lax.top_k(jnp.where(cand_mask, scores, -1.0), C)
    found_c = jnp.take(cand_mask, sidx)                  # [C]

    # Group of candidate c = its covisibility neighborhood (+ itself); the
    # streak continues if it overlaps ANY previous streak's group.  Covis
    # groups, not slot adjacency: slots are free-list reused.
    eye_c = jax.nn.one_hot(sidx, K, dtype=bool)
    g_cand = ((map_state.covis[sidx] > 0) | eye_c) & map_state.kf_valid
    prev = jnp.clip(loop.streak_kf, 0, K - 1)            # [C]
    eye_p = jax.nn.one_hot(prev, K, dtype=bool)
    g_prev = (
        ((map_state.covis[prev] > 0) | eye_p)
        & map_state.kf_valid
        & (loop.streak_kf >= 0)[:, None]
    )
    overlap = jnp.any(g_cand[:, None, :] & g_prev[None, :, :], -1)  # [C, C]
    prev_len = jnp.max(
        jnp.where(overlap, loop.streak_len[None, :], 0), axis=1
    )                                                    # [C]
    streak = jnp.where(found_c, prev_len + 1, 0)
    new_loop = loop._replace(
        streak_kf=jnp.where(found_c, sidx, -1).astype(jnp.int32),
        streak_len=streak.astype(jnp.int32),
    )

    consistent_c = found_c & (streak >= lc.consistency)
    # Report the best consistent candidate if any, else the best candidate
    # (host logs it; verification keys off `consistent`).
    pick = jnp.argmax(jnp.where(consistent_c, svals, -1.0))
    any_cons = consistent_c[pick]
    best = jnp.where(any_cons, sidx[pick], sidx[0])
    found = jnp.where(any_cons, True, found_c[0])
    det = LoopDetection(
        candidate=jnp.where(found, best, -1).astype(jnp.int32),
        score=scores[jnp.clip(best, 0, K - 1)],
        consistent=any_cons,
    )
    return new_loop, det


@functools.partial(jax.jit, static_argnums=(0,))
def verify_loops_batch(cfg: SlamConfig, map_state, kf_curs, kf_cands, keys):
    """Verify a PADDED batch of loop candidates in one dispatch.

    The host accumulates every consistent candidate of a drained chunk and
    verifies them together: over a remote-device tunnel each separate
    verify call costs ~2 round trips (~50 ms), which at one consistent
    (often aliased) candidate per keyframe event dominated the frame
    budget (r3 finding: 17 fps with sequential verifies, with tracking
    itself at ~10 ms/frame).

    Returns vmapped (ok, T_cur_cand, n_inliers, idx, inlier_mask).
    """
    return jax.vmap(
        lambda a, b, k: verify_loop(cfg, map_state, a, b, k)
    )(kf_curs, kf_cands, keys)


@functools.partial(jax.jit, static_argnums=(0,))
def verify_loop(cfg: SlamConfig, map_state, kf_cur, kf_cand, key):
    """Geometric verification: mutual Hamming matches between the two
    keyframes' descriptors, then SE3 RANSAC on their keypoint
    backprojections.

    Returns (ok, T_cur_cand [7], n_inliers) with
    x_cur ≈ T_cur_cand · x_cand for camera-frame points.
    """
    lc = cfg.loop
    cam = cfg.camera
    d_cur = map_state.kf_desc[kf_cur]
    d_cand = map_state.kf_desc[kf_cand]
    z_cur = map_state.kf_depth[kf_cur]
    z_cand = map_state.kf_depth[kf_cand]
    v_cur = map_state.kf_kp_valid[kf_cur] & (z_cur > 0)
    v_cand = map_state.kf_kp_valid[kf_cand] & (z_cand > 0)
    # Wide threshold: RANSAC gates the outliers, and grid-distributed
    # keypoints make cross-visit matches sparser than clustered ones.
    dist = hamming.hamming_matrix_mxu(d_cur, d_cand)
    idx, ok, _ = hamming.match_top2(
        dist, v_cur, v_cand, max_dist=cfg.matcher.hamming_high,
        ratio=0.9, mutual=True,
    )
    # Rotation-consistency histogram over the match set (reference Matcher).
    cand_angle = map_state.kf_angle[kf_cand]
    ok = rotation_consistency(
        map_state.kf_angle[kf_cur],
        cand_angle[jnp.clip(idx, 0, cand_angle.shape[0] - 1)],
        ok,
    )
    idx = jnp.where(ok, idx, -1)
    N = d_cur.shape[0]
    j = jnp.clip(idx, 0, N - 1)
    xc_cur = cam_mod.backproject(cam, map_state.kf_uv[kf_cur], z_cur)
    xc_cand = cam_mod.backproject(cam, map_state.kf_uv[kf_cand], z_cand)
    # Depth-adaptive inlier radius (per correspondence): RGBD 3D noise
    # grows with range, and a fixed radius starves RANSAC of far points in
    # hall-scale scenes (r4 finding: genuine revisits with 60-80 refined
    # pixel-GN inliers rejected because <40 far-depth correspondences fit
    # inside 10 cm).
    thr = jnp.maximum(lc.se3_threshold, lc.se3_rel_threshold * z_cur)
    inl_gate = max(lc.se3_inliers,
                   int(round(lc.se3_inlier_frac * cfg.orb.n_features)))
    res = ransac_se3(
        xc_cand[j], xc_cur, ok, key,
        n_hypotheses=cfg.tracker.ransac_iters,
        threshold=thr,
        min_inliers=inl_gate,
    )
    # Refine the RANSAC SE3 at pixel accuracy: robust GN on reprojection (+
    # depth) residuals of the matches (reference: SE3 solver then projection
    # optimization, §3.4).  The Umeyama fit is only ~cm-accurate at the 3D
    # inlier radius; feeding that straight into the pose graph injects the
    # error into every keyframe.  Gate on the GN chi2 inlier count — a much
    # tighter verification than the 3D radius.
    refined = optimize_pose(
        cfg, res.pose, xc_cand[j], map_state.kf_uv[kf_cur], z_cur,
        ok & (z_cur > 0), ok, map_state.kf_octave[kf_cur],
        inliers0=res.inliers,
    )
    # Descriptor-level candidate gate (config min_score_matches) + the GN
    # chi2 inlier gate: both must clear for the edge to enter the pose graph.
    enough_matches = jnp.sum(ok) >= lc.min_score_matches
    good = res.ok & enough_matches & (refined.n_inliers >= inl_gate)
    return good, refined.pose, refined.n_inliers, idx, refined.inliers & ok
