"""Trajectory alignment + ATE evaluation (reference eval module, SURVEY.md §2.1).

Implements Horn/Umeyama closed-form SE(3)/Sim(3) alignment and the TUM-style
absolute trajectory error: align the estimated trajectory to groundtruth, then
report the RMSE of translational residuals (BASELINE.json primary metric).
"""

from __future__ import annotations

import jax.numpy as jnp

from boslam_tpu.geometry import se3


def umeyama(src, dst, weights=None, with_scale: bool = False):
    """Least-squares similarity transform aligning ``src`` onto ``dst``.

    Args:
      src, dst: [N, 3] corresponding points.
      weights: optional [N] nonnegative weights (mask-friendly).
      with_scale: solve for scale (Sim3) or fix s=1 (SE3; RGBD case).

    Returns:
      (scale, q[4], t[3]) with dst ≈ s * R(q) src + t.
    """
    if weights is None:
        weights = jnp.ones(src.shape[0])
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mu_s = jnp.sum(w[:, None] * src, axis=0)
    mu_d = jnp.sum(w[:, None] * dst, axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * w[:, None]).T @ sc  # [3, 3], dst-rows x src-cols
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.stack([1.0, 1.0, d]))
    R = U @ D @ Vt
    var_s = jnp.sum(w * jnp.sum(sc * sc, axis=-1))
    s = jnp.where(
        with_scale, jnp.sum(S * jnp.diag(D)) / jnp.maximum(var_s, 1e-12), 1.0
    )
    t = mu_d - s * R @ mu_s
    return s, se3.mat_to_quat(R), t


def ate_rmse(est_t, gt_t, weights=None, with_scale: bool = False):
    """Absolute trajectory error RMSE after Umeyama alignment.

    Args:
      est_t: [N, 3] estimated positions (camera centres, world frame).
      gt_t: [N, 3] groundtruth positions (time-associated).

    Returns:
      (rmse, aligned_est[N, 3])
    """
    if weights is None:
        weights = jnp.ones(est_t.shape[0])
    s, q, t = umeyama(est_t, gt_t, weights, with_scale)
    aligned = s * se3.quat_rotate(q[None, :], est_t) + t
    err2 = jnp.sum((aligned - gt_t) ** 2, axis=-1)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    return jnp.sqrt(jnp.sum(w * err2)), aligned


def rpe(est_poses, gt_poses, delta: int = 1):
    """Relative pose error over a fixed frame delta.

    Args:
      est_poses, gt_poses: [N, 7] world-frame poses (T_wc).

    Returns:
      (trans_rmse, rot_rmse_rad)
    """
    e0, e1 = est_poses[:-delta], est_poses[delta:]
    g0, g1 = gt_poses[:-delta], gt_poses[delta:]
    de = se3.pose_compose(se3.pose_inv(e0), e1)
    dg = se3.pose_compose(se3.pose_inv(g0), g1)
    err = se3.pose_compose(se3.pose_inv(dg), de)
    dt = jnp.linalg.norm(err[..., 4:], axis=-1)
    dr = jnp.linalg.norm(se3.so3_log(err[..., :4]), axis=-1)
    return jnp.sqrt(jnp.mean(dt**2)), jnp.sqrt(jnp.mean(dr**2))
