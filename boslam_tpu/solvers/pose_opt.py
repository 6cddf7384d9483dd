"""Motion-only bundle adjustment: robust Gauss-Newton on one SE3 pose.

Replaces the reference's g2o motion-only BA (SURVEY.md §2.1 "Optimization
wrappers (a)": 1 SE3 vertex, unary reprojection edges, Huber kernel, 4x10 LM
rounds with chi2 inlier reclassification; call stack §3.2 "refine").

Residual per observation (RGBD): [u_pred - u_obs, v_pred - v_obs,
w_d * (z_pred - z_obs)] — the depth row plays ORB-SLAM2's stereo residual
role.  All edges evaluated batched; the 6x6 normal system is a couple of
einsums; the damped solve is a 6x6 Cholesky — no sparse structure needed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from boslam_tpu.config import SlamConfig
from boslam_tpu.geometry import camera as cam_mod
from boslam_tpu.geometry import se3
from boslam_tpu.solvers import robust


class PoseOptResult(NamedTuple):
    pose: jnp.ndarray       # [7] refined T_cw
    inliers: jnp.ndarray    # [N] bool final inlier mask
    n_inliers: jnp.ndarray  # scalar i32
    chi2: jnp.ndarray       # scalar final robust cost


def pose_residuals(cfg: SlamConfig, pose_cw, pts_w, uv_obs, depth_obs, has_depth):
    """Batched residuals r [N, 3] and Jacobians J [N, 3, 6] wrt left-mult
    twist update exp(xi) ∘ T_cw, xi = (omega, v)."""
    cam = cfg.camera
    w_d = cfg.tracker.depth_weight
    xc = se3.pose_apply(pose_cw[None, :], pts_w)
    uv_pred = cam_mod.project(cam, xc)
    r_uv = uv_pred - uv_obs
    r_z = jnp.where(has_depth, w_d * (xc[..., 2] - depth_obs), 0.0)
    r = jnp.concatenate([r_uv, r_z[..., None]], axis=-1)

    # d xc / d xi = [-hat(xc) | I]  (left perturbation)
    dxc = jnp.concatenate(
        [-se3.hat(xc), jnp.broadcast_to(jnp.eye(3), xc.shape[:-1] + (3, 3))],
        axis=-1,
    )  # [N, 3, 6]
    J_uv = cam_mod.project_jacobian(cam, xc) @ dxc  # [N, 2, 6]
    J_z = w_d * dxc[:, 2:3, :]  # [N, 1, 6]
    J_z = jnp.where(has_depth[:, None, None], J_z, 0.0)
    J = jnp.concatenate([J_uv, J_z], axis=-2)
    behind = xc[..., 2] <= 1e-3
    return jnp.where(behind[:, None], 0.0, r), jnp.where(
        behind[:, None, None], 0.0, J
    )


@functools.partial(jax.jit, static_argnums=(0,))
def optimize_pose(
    cfg: SlamConfig,
    pose0,
    pts_w,
    uv_obs,
    depth_obs,
    has_depth,
    obs_mask,
    octave=None,
    inliers0=None,
) -> PoseOptResult:
    """Robust GN pose refinement with chi2 outlier gating.

    Runs ``ba_rounds`` outer rounds; each round does ``ba_iters`` damped GN
    steps on current inliers, then reclassifies inliers at the chi2 bound
    (2 dof for mono edges, 3 dof for depth edges) — the reference's g2o
    schedule, expressed as lax loops.

    ``inliers0`` optionally seeds the first round's inlier set (e.g. a RANSAC
    consensus set when ``obs_mask`` is outlier-heavy); reclassification can
    re-admit any ``obs_mask`` edge that agrees at the chi2 bound.
    """
    tk = cfg.tracker
    n = pts_w.shape[0]
    if octave is None:
        octave = jnp.zeros((n,), jnp.int32)
    info = robust.octave_inv_sigma2(octave, cfg.orb.scale_factor)

    def edge_chi2(pose):
        r, _ = pose_residuals(cfg, pose, pts_w, uv_obs, depth_obs, has_depth)
        return jnp.sum(r * r, axis=-1) * info

    def gn_round(carry, _):
        pose, inlier = carry

        def gn_step(carry, _):
            pose, prev_cost = carry
            r, J = pose_residuals(cfg, pose, pts_w, uv_obs, depth_obs, has_depth)
            chi2 = jnp.sum(r * r, axis=-1) * info
            cost = jnp.sum(robust.huber_cost(chi2, tk.huber_delta) * inlier)
            # Reject the PREVIOUS step if it increased the robust cost — the
            # guard reuses this iteration's residual evaluation instead of
            # paying a second one (the Huber-IRLS step is almost always
            # downhill from a motion-model init, so one-step-late rejection
            # costs nothing in practice).
            w = robust.huber_weight(chi2, tk.huber_delta) * info * inlier
            H = jnp.einsum("nri,n,nrj->ij", J, w, J)
            b = -jnp.einsum("nri,n,nr->i", J, w, r)
            H = H + 1e-5 * jnp.eye(6) * (1.0 + jnp.trace(H) / 6.0)
            xi = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(H), b)
            xi = jnp.where(jnp.all(jnp.isfinite(xi)), xi, 0.0)
            new_pose = se3.retract(pose, xi)
            return (new_pose, cost), (pose, cost)

        (pose_last, _), (poses_hist, costs_hist) = jax.lax.scan(
            gn_step, (pose, jnp.inf), None, length=tk.ba_iters
        )
        # Pick the iterate with the lowest observed cost (includes the final
        # proposal's predecessor; costs_hist[k] is the cost AT poses_hist[k]).
        best = jnp.argmin(costs_hist)
        pose = poses_hist[best]
        final_cost = jnp.sum(
            robust.huber_cost(edge_chi2(pose_last), tk.huber_delta) * inlier
        )
        pose = jnp.where(final_cost <= costs_hist[best], pose_last, pose)
        chi2 = edge_chi2(pose)
        bound = jnp.where(has_depth, tk.chi2_3d, tk.chi2_2d)
        inlier = obs_mask.astype(jnp.float32) * (chi2 < bound)
        return (pose, inlier), None

    inlier0 = (obs_mask if inliers0 is None else inliers0).astype(jnp.float32)
    (pose, inlier), _ = jax.lax.scan(
        gn_round, (pose0, inlier0), None, length=tk.ba_rounds
    )
    chi2 = edge_chi2(pose)
    cost = jnp.sum(robust.huber_cost(chi2, tk.huber_delta) * inlier)
    return PoseOptResult(
        pose=pose,
        inliers=inlier > 0.5,
        n_inliers=jnp.sum(inlier > 0.5).astype(jnp.int32),
        chi2=cost,
    )
