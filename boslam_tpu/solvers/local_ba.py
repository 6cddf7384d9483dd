"""Local bundle adjustment over the covisibility window, Schur-complement LM.

Reference contract (SURVEY.md §3.3 local_ba + §3.5): optimize the covisible
keyframes of the newest keyframe and all their map points, with a fixed
second ring; assemble the block-sparse normal equations, eliminate landmark
blocks via the Schur complement, solve the reduced camera system, back-
substitute, inside an accept/reject LM damping loop.

TPU-first layout (SURVEY.md §7.1 step 5):
- static window: N_OPT optimized + N_FIX fixed cameras, compacted active
  landmark set of MAX_LOCAL points (jnp.nonzero with static size);
- per-block Hessians by segment_sum over the static edge list;
- camera-point coupling A[p, c] lives as one dense [L, N_OPT, 6, 3] tensor,
  so the Schur reduction  S = H_cc - sum_p A H_pp^-1 A^T  is two einsums on
  the MXU; the reduced system is a dense (N_OPT*6)^2 Cholesky.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from boslam_tpu.config import SlamConfig
from boslam_tpu.geometry import se3
from boslam_tpu.mapping.map_state import MapState, recompute_covis
from boslam_tpu.solvers import ba_core
from boslam_tpu.solvers.ba_core import BaEdges
from boslam_tpu.solvers import robust as robust_mod


class LocalBaStats(NamedTuple):
    cost0: jnp.ndarray
    cost1: jnp.ndarray
    n_edges: jnp.ndarray
    n_points: jnp.ndarray


def _select_window(cfg: SlamConfig, state: MapState, center):
    """(opt_ids [KO], opt_mask, fix_ids [KF], fix_mask) keyframe windows."""
    KO = cfg.local_ba.n_opt_kf
    KF_ = cfg.local_ba.n_fixed_kf
    K = state.covis.shape[0]
    row = state.covis[center] * state.kf_valid
    row = row.at[center].set(0)
    w, ids = jax.lax.top_k(row, KO - 1)
    opt_ids = jnp.concatenate([center[None], ids])
    opt_mask = jnp.concatenate([jnp.ones(1, bool), w > 0])
    opt_mask = opt_mask & state.kf_valid[opt_ids]
    # Keyframe 0 anchors the gauge: never optimized.
    opt_cam_mask = opt_mask & (opt_ids != 0)

    # Fixed ring: most covisible with the window, not already in it.
    in_opt = jnp.zeros(K, bool).at[jnp.where(opt_mask, opt_ids, K)].set(
        True, mode="drop"
    )
    in_opt = in_opt.at[opt_ids[0]].set(True)
    ring = jnp.sum(
        state.covis[opt_ids] * opt_mask[:, None], axis=0
    ) * state.kf_valid
    ring = jnp.where(in_opt, 0, ring)
    # KF0 joins the fixed set whenever it sees window points.
    wf, fix_ids = jax.lax.top_k(ring, KF_)
    fix_mask = (wf > 0) & state.kf_valid[fix_ids]
    return opt_ids, opt_mask, opt_cam_mask, fix_ids, fix_mask


def _build_problem(cfg: SlamConfig, state: MapState, center):
    """Compacted cameras, points, and the static edge list."""
    L = cfg.local_ba.max_local_points
    P = state.pt_xyz.shape[0]
    opt_ids, opt_mask, opt_cam_mask, fix_ids, fix_mask = _select_window(
        cfg, state, center
    )
    cam_ids = jnp.concatenate([opt_ids, fix_ids])          # [C]
    cam_mask = jnp.concatenate([opt_mask, fix_mask])
    poses = state.kf_pose[cam_ids]

    # Active points: observed by the optimized window.
    obs_opt = state.kf_obs_pt[opt_ids]                     # [KO, N]
    obs_opt = jnp.where((obs_opt >= 0) & opt_mask[:, None], obs_opt, P)
    active = jnp.zeros(P + 1, bool).at[obs_opt.reshape(-1)].set(True)
    active = active[:P] & state.pt_valid
    local_ids, = jnp.nonzero(active, size=L, fill_value=P)  # [L] -> global
    slot_used = local_ids < P
    inv = jnp.full(P + 1, -1, jnp.int32).at[jnp.clip(local_ids, 0, P)].set(
        jnp.where(slot_used, jnp.arange(L, dtype=jnp.int32), -1), mode="drop"
    )
    pts = state.pt_xyz[jnp.clip(local_ids, 0, P - 1)]       # [L, 3]

    # Edges: every (window camera, keypoint slot) whose point is active.
    C, N = cam_ids.shape[0], state.kf_obs_pt.shape[1]
    obs = state.kf_obs_pt[cam_ids]                          # [C, N]
    pl = inv[jnp.clip(obs, 0, P)]                           # [C, N] local pt
    valid = (
        (obs >= 0)
        & (pl >= 0)
        & cam_mask[:, None]
        & state.kf_kp_valid[cam_ids]
    )
    cam_idx = jnp.broadcast_to(jnp.arange(C)[:, None], (C, N))
    depth = state.kf_depth[cam_ids]
    edges = BaEdges(
        cam=cam_idx.reshape(-1).astype(jnp.int32),
        pt=jnp.clip(pl.reshape(-1), 0, L - 1).astype(jnp.int32),
        uv=state.kf_uv[cam_ids].reshape(-1, 2),
        depth=depth.reshape(-1),
        has_depth=(depth.reshape(-1) > 0) & valid.reshape(-1),
        info=robust_mod.octave_inv_sigma2(
            state.kf_octave[cam_ids].reshape(-1), cfg.orb.scale_factor
        ),
        valid=valid.reshape(-1),
    )
    return (
        cam_ids, cam_mask, opt_cam_mask, poses, local_ids, slot_used, pts, edges
    )


def _lm_solve_step(cfg: SlamConfig, poses, pts, edges, opt_cam_mask, lam):
    """One damped Schur-LM solve: returns (dxi [C?, 6] for opt cams,
    dpt [L, 3])."""
    KO = cfg.local_ba.n_opt_kf
    L = pts.shape[0]
    delta = cfg.local_ba.huber_delta
    r, J_cam, J_pt = ba_core.edge_residuals(cfg, poses, pts, edges)
    w, _ = ba_core.robust_weights(cfg, r, edges, delta)

    is_opt_edge = (edges.cam < KO) & opt_cam_mask[jnp.clip(edges.cam, 0, KO - 1)]
    Jc = jnp.where(is_opt_edge[:, None, None], J_cam, 0.0)

    # Per-block terms (all [E, ...] then segment-summed).
    wJc = w[:, None, None] * Jc
    wJp = w[:, None, None] * J_pt
    Hcc_e = jnp.einsum("eri,erj->eij", Jc, wJc)            # [E, 6, 6]
    Hpp_e = jnp.einsum("eri,erj->eij", J_pt, wJp)          # [E, 3, 3]
    Wcp_e = jnp.einsum("eri,erj->eij", Jc, wJp)            # [E, 6, 3]
    bc_e = -jnp.einsum("eri,er->ei", Jc, w[:, None] * r)   # [E, 6]
    bp_e = -jnp.einsum("eri,er->ei", J_pt, w[:, None] * r) # [E, 3]

    seg_c = jnp.where(is_opt_edge, edges.cam, KO)
    Hcc = jax.ops.segment_sum(Hcc_e, seg_c, num_segments=KO + 1)[:KO]
    bc = jax.ops.segment_sum(bc_e, seg_c, num_segments=KO + 1)[:KO]
    seg_p = jnp.where(edges.valid, edges.pt, L)
    Hpp = jax.ops.segment_sum(Hpp_e, seg_p, num_segments=L + 1)[:L]
    bp = jax.ops.segment_sum(bp_e, seg_p, num_segments=L + 1)[:L]
    seg_cp = jnp.where(is_opt_edge, edges.pt * KO + edges.cam, L * KO)
    A = jax.ops.segment_sum(
        Wcp_e, seg_cp, num_segments=L * KO + 1
    )[: L * KO].reshape(L, KO, 6, 3)

    # Marquardt damping.
    eye3 = jnp.eye(3)
    Hpp_d = Hpp + lam * (eye3 * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6
    )[..., None, :] * eye3) + 1e-8 * eye3
    Hpp_inv = ba_core.inv3x3(Hpp_d)

    # Schur reduction on the MXU.
    M = jnp.einsum("pkis,pst->pkit", A, Hpp_inv)            # [L, KO, 6, 3]
    S_cross = jnp.einsum("pait,pbjt->aibj", M, A)           # [KO,6,KO,6]
    S = jnp.zeros((KO, 6, KO, 6))
    S = S.at[jnp.arange(KO), :, jnp.arange(KO), :].add(Hcc)
    S = S - S_cross
    b_s = bc - jnp.einsum("pait,pt->ai", M, bp)             # [KO, 6]

    D = KO * 6
    S = S.reshape(D, D)
    b_s = b_s.reshape(D)
    # Mask out non-optimized camera rows/cols (identity rows).
    m = jnp.repeat(opt_cam_mask.astype(jnp.float32), 6)
    S = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
    b_s = b_s * m
    diagS = jnp.maximum(jnp.diag(S), 1e-6)
    S = S + lam * jnp.diag(diagS) * jnp.eye(D)
    dxi = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S + 1e-7 * jnp.eye(D)), b_s
    ).reshape(KO, 6)
    dxi = dxi * opt_cam_mask[:, None]

    # Back-substitute points.
    dpt = jnp.einsum(
        "pst,pt->ps", Hpp_inv, bp - jnp.einsum("pait,ai->pt", A, dxi)
    )
    return dxi, dpt


@functools.partial(jax.jit, static_argnums=(0,))
def local_bundle_adjustment(cfg: SlamConfig, state: MapState, center):
    """Run local BA around keyframe ``center``; returns (MapState, stats)."""
    lb = cfg.local_ba
    KO = lb.n_opt_kf
    P = state.pt_xyz.shape[0]
    (cam_ids, cam_mask, opt_cam_mask, poses, local_ids, slot_used, pts,
     edges) = _build_problem(cfg, state, center)

    cost0 = ba_core.robust_cost(cfg, poses, pts, edges, lb.huber_delta)

    def lm_iter(carry, _):
        poses, pts, lam, cost = carry
        dxi, dpt = _lm_solve_step(cfg, poses, pts, edges, opt_cam_mask, lam)
        new_opt = se3.retract(poses[:KO], dxi)
        new_poses = jnp.concatenate([new_opt, poses[KO:]])
        new_pts = pts + dpt
        new_cost = ba_core.robust_cost(cfg, new_poses, new_pts, edges, lb.huber_delta)
        accept = new_cost < cost
        poses = jnp.where(accept, new_poses, poses)
        pts = jnp.where(accept, new_pts, pts)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e3)
        cost = jnp.minimum(new_cost, cost)
        return (poses, pts, lam, cost), None

    (poses, pts, _, cost1), _ = jax.lax.scan(
        lm_iter, (poses, pts, jnp.asarray(lb.lm_lambda0), cost0), None,
        length=lb.lm_iters,
    )

    # Write back optimized cameras and points.
    opt_ids = cam_ids[:KO]
    kf_pose = state.kf_pose.at[
        jnp.where(opt_cam_mask, opt_ids, state.kf_pose.shape[0])
    ].set(poses[:KO], mode="drop")
    pt_xyz = state.pt_xyz.at[jnp.where(slot_used, local_ids, P)].set(
        pts, mode="drop"
    )
    new_state = state._replace(kf_pose=kf_pose, pt_xyz=pt_xyz)
    stats = LocalBaStats(
        cost0=cost0,
        cost1=cost1,
        n_edges=jnp.sum(edges.valid),
        n_points=jnp.sum(slot_used),
    )
    return new_state, stats
