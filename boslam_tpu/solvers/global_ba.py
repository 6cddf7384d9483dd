"""Global bundle adjustment: all keyframes + all landmarks, matrix-free PCG.

BASELINE config 4 ("dense keyframe map, 50k+ landmark global BA"): at global
scale the reduced camera system outgrows a dense factorization, so the Schur
complement is applied *matrix-free* inside preconditioned conjugate gradient
(SURVEY.md §7.1 step 7):

    S x = (H_cc + lam D) x − W H_pp^-1 W^T x

where every operator application is two segment-sums over the static edge
list (camera->point scatter, point->camera gather) — no [C, P] coupling
tensor is ever formed.  Preconditioner: block-Jacobi with the damped H_cc
6x6 blocks.  The landmark back-substitution is the same shard-local formula
as local BA.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from boslam_tpu.config import SlamConfig
from boslam_tpu.geometry import se3
from boslam_tpu.mapping.map_state import MapState
from boslam_tpu.solvers import ba_core
from boslam_tpu.solvers.ba_core import BaEdges
from boslam_tpu.solvers import robust as robust_mod


class GlobalBaStats(NamedTuple):
    cost0: jnp.ndarray
    cost1: jnp.ndarray
    n_edges: jnp.ndarray


def build_global_edges(cfg: SlamConfig, state: MapState) -> BaEdges:
    """Every (keyframe, keypoint-slot) observation is an edge; cameras are
    global keyframe ids, points are global point ids."""
    K, N = state.kf_obs_pt.shape
    P = state.pt_xyz.shape[0]
    obs = state.kf_obs_pt
    valid = (
        (obs >= 0)
        & state.kf_valid[:, None]
        & state.kf_kp_valid
        & state.pt_valid[jnp.clip(obs, 0, P - 1)]
    )
    cam_idx = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N))
    depth = state.kf_depth
    return BaEdges(
        cam=cam_idx.reshape(-1).astype(jnp.int32),
        pt=jnp.clip(obs.reshape(-1), 0, P - 1).astype(jnp.int32),
        uv=state.kf_uv.reshape(-1, 2),
        depth=depth.reshape(-1),
        has_depth=(depth.reshape(-1) > 0) & valid.reshape(-1),
        info=robust_mod.octave_inv_sigma2(
            state.kf_octave.reshape(-1), cfg.orb.scale_factor
        ),
        valid=valid.reshape(-1),
    )


def _assemble(cfg: SlamConfig, poses, pts, edges, opt_cam_mask, lam, delta):
    """Block terms for the matrix-free Schur operator."""
    C = poses.shape[0]
    P = pts.shape[0]
    r, J_cam, J_pt = ba_core.edge_residuals(cfg, poses, pts, edges)
    w, _ = ba_core.robust_weights(cfg, r, edges, delta)
    Jc = jnp.where(opt_cam_mask[edges.cam][:, None, None], J_cam, 0.0)

    wJc = w[:, None, None] * Jc
    wJp = w[:, None, None] * J_pt
    seg_c = jnp.where(edges.valid, edges.cam, C)
    seg_p = jnp.where(edges.valid, edges.pt, P)
    Hcc = jax.ops.segment_sum(
        jnp.einsum("eri,erj->eij", Jc, wJc), seg_c, num_segments=C + 1
    )[:C]
    bc = jax.ops.segment_sum(
        -jnp.einsum("eri,er->ei", Jc, w[:, None] * r), seg_c, num_segments=C + 1
    )[:C]
    Hpp = jax.ops.segment_sum(
        jnp.einsum("eri,erj->eij", J_pt, wJp), seg_p, num_segments=P + 1
    )[:P]
    bp = jax.ops.segment_sum(
        -jnp.einsum("eri,er->ei", J_pt, w[:, None] * r), seg_p, num_segments=P + 1
    )[:P]

    eye3 = jnp.eye(3)
    Hpp_d = Hpp + lam * (
        eye3 * jnp.maximum(jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6)[..., None, :]
    ) + 1e-8 * eye3
    Hpp_inv = ba_core.inv3x3(Hpp_d)

    eye6 = jnp.eye(6)
    Hcc_d = Hcc + lam * (
        eye6 * jnp.maximum(jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-6)[..., None, :]
    ) + 1e-7 * eye6
    return r, Jc, J_pt, w, Hcc_d, bc, Hpp_inv, bp


def _schur_matvec(x, Jc, J_pt, w, Hcc_d, Hpp_inv, edges, C, P):
    """y = S x, matrix-free: edge-wise scatter/gather instead of A tensors."""
    # u_e = W_e^T x_cam(e)  where W_e = Jc^T w Jp  (6x3 per edge)
    xc = x[edges.cam]                                      # [E, 6]
    u = jnp.einsum("eri,ei->er", Jc, xc) * w[:, None]      # [E, 3(res)]
    u = jnp.einsum("er,erj->ej", u, J_pt)
    seg_p = jnp.where(edges.valid, edges.pt, P)
    t = jax.ops.segment_sum(u, seg_p, num_segments=P + 1)[:P]   # [P, 3]
    z = jnp.einsum("pst,pt->ps", Hpp_inv, t)               # [P, 3]
    # back to cameras: v_e = W_e z_p(e)
    ze = z[edges.pt]
    v = jnp.einsum("erj,ej->er", J_pt, ze) * w[:, None]
    v = jnp.einsum("er,eri->ei", v, Jc)
    seg_c = jnp.where(edges.valid, edges.cam, C)
    y_cross = jax.ops.segment_sum(v, seg_c, num_segments=C + 1)[:C]
    y_diag = jnp.einsum("cij,cj->ci", Hcc_d, x)
    return y_diag - y_cross


def _pcg(matvec, b, Minv_blocks, iters: int):
    """Block-Jacobi preconditioned CG on the camera system ([C, 6] layout)."""

    def apply_M(r):
        return jnp.einsum("cij,cj->ci", Minv_blocks, r)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_M(r0)
    p0 = z0

    def body(carry, _):
        x, r, z, p = carry
        Ap = matvec(p)
        rz = jnp.sum(r * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-12)
        x = x + alpha * p
        r_new = r - alpha * Ap
        z_new = apply_M(r_new)
        beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-12)
        p = z_new + beta * p
        return (x, r_new, z_new, p), jnp.sum(r_new * r_new)

    (x, r, _, _), _ = jax.lax.scan(body, (x0, r0, z0, p0), None, length=iters)
    return x


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def global_bundle_adjustment(
    cfg: SlamConfig, state: MapState, lm_iters: int = 6, cg_iters: int = 40
):
    """Full-map BA; returns (MapState, GlobalBaStats).  KF0 fixed (gauge)."""
    delta = cfg.local_ba.huber_delta
    C = state.kf_pose.shape[0]
    P = state.pt_xyz.shape[0]
    edges = build_global_edges(cfg, state)
    opt_cam_mask = state.kf_valid & (jnp.arange(C) > 0)
    poses0 = state.kf_pose
    pts0 = state.pt_xyz
    cost0 = ba_core.robust_cost(cfg, poses0, pts0, edges, delta)

    def lm_iter(carry, _):
        poses, pts, lam, cost = carry
        r, Jc, J_pt, w, Hcc_d, bc, Hpp_inv, bp = _assemble(
            cfg, poses, pts, edges, opt_cam_mask, lam, delta
        )
        # Right-hand side of the reduced system: bc - W Hpp^-1 bp.
        zb = jnp.einsum("pst,pt->ps", Hpp_inv, bp)
        ze = zb[edges.pt]
        v = jnp.einsum("erj,ej->er", J_pt, ze) * w[:, None]
        v = jnp.einsum("er,eri->ei", v, Jc)
        seg_c = jnp.where(edges.valid, edges.cam, C)
        b_s = bc - jax.ops.segment_sum(v, seg_c, num_segments=C + 1)[:C]
        b_s = b_s * opt_cam_mask[:, None]

        Minv = _inv6x6(Hcc_d)

        def mv(x):
            x = x * opt_cam_mask[:, None]
            y = _schur_matvec(x, Jc, J_pt, w, Hcc_d, Hpp_inv, edges, C, P)
            return y * opt_cam_mask[:, None] + x * (~opt_cam_mask[:, None])

        dxi = _pcg(mv, b_s, Minv, cg_iters) * opt_cam_mask[:, None]
        # Back-substitute landmarks.
        xc = dxi[edges.cam]
        u = jnp.einsum("eri,ei->er", Jc, xc) * w[:, None]
        u = jnp.einsum("er,erj->ej", u, J_pt)
        seg_p = jnp.where(edges.valid, edges.pt, P)
        t = jax.ops.segment_sum(u, seg_p, num_segments=P + 1)[:P]
        dpt = jnp.einsum("pst,pt->ps", Hpp_inv, bp - t)

        new_poses = se3.retract(poses, dxi)
        new_pts = pts + dpt
        new_cost = ba_core.robust_cost(cfg, new_poses, new_pts, edges, delta)
        accept = new_cost < cost
        poses = jnp.where(accept, new_poses, poses)
        pts = jnp.where(accept, new_pts, pts)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e3)
        return (poses, pts, lam, jnp.minimum(new_cost, cost)), None

    (poses, pts, _, cost1), _ = jax.lax.scan(
        lm_iter, (poses0, pts0, jnp.asarray(1e-4), cost0), None, length=lm_iters
    )
    new_state = state._replace(
        kf_pose=jnp.where(opt_cam_mask[:, None], poses, state.kf_pose),
        pt_xyz=jnp.where(state.pt_valid[:, None], pts, state.pt_xyz),
    )
    return new_state, GlobalBaStats(cost0, cost1, jnp.sum(edges.valid))


def _inv6x6(M):
    """Batched 6x6 inverse (block-Jacobi preconditioner blocks)."""
    return jnp.linalg.inv(M + 1e-6 * jnp.eye(6))
