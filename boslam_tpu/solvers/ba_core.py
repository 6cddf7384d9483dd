"""Shared bundle-adjustment machinery: edge residuals/Jacobians + assembly.

This is the inner LM structure of SURVEY.md §3.5 — batched residuals,
per-block Hessians, Schur elimination of landmark blocks — owned in JAX
instead of g2o's C++ ``BlockSolver_6_3`` (SURVEY.md §2.2 row "g2o").

An edge connects (camera c, point p) with measurement (uv, depth, octave).
Residual rows: [du, dv, w_d * dz]; Jacobians wrt the camera's left-mult twist
(omega, v) and wrt the world point.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from boslam_tpu.config import SlamConfig
from boslam_tpu.geometry import camera as cam_mod
from boslam_tpu.geometry import se3
from boslam_tpu.solvers import robust


class BaEdges(NamedTuple):
    """Static-shape edge list for a BA problem."""

    cam: jnp.ndarray      # [E] i32 local camera index
    pt: jnp.ndarray       # [E] i32 local point index
    uv: jnp.ndarray       # [E, 2] f32 measured pixels
    depth: jnp.ndarray    # [E] f32 measured keypoint depth (0 = none)
    has_depth: jnp.ndarray# [E] bool
    info: jnp.ndarray     # [E] f32 information weight (per-octave)
    valid: jnp.ndarray    # [E] bool


def edge_residuals(cfg: SlamConfig, poses, pts, edges: BaEdges):
    """Residuals r [E, 3] and Jacobians (J_cam [E, 3, 6], J_pt [E, 3, 3]).

    poses: [C, 7] T_cw per local camera; pts: [L, 3] world points.
    """
    cam = cfg.camera
    w_d = cfg.tracker.depth_weight
    pose_e = poses[edges.cam]            # [E, 7]
    X = pts[edges.pt]                    # [E, 3]
    xc = se3.pose_apply(pose_e, X)
    uv_pred = cam_mod.project(cam, xc)
    r_uv = uv_pred - edges.uv
    r_z = jnp.where(edges.has_depth, w_d * (xc[..., 2] - edges.depth), 0.0)
    r = jnp.concatenate([r_uv, r_z[..., None]], axis=-1)

    dxc_dxi = jnp.concatenate(
        [-se3.hat(xc), jnp.broadcast_to(jnp.eye(3), xc.shape[:-1] + (3, 3))],
        axis=-1,
    )  # [E, 3, 6]
    Jp2 = cam_mod.project_jacobian(cam, xc)       # [E, 2, 3] d uv / d xc
    R = se3.quat_to_mat(pose_e[..., :4])          # [E, 3, 3] d xc / d X
    J_cam_uv = Jp2 @ dxc_dxi
    J_cam_z = w_d * dxc_dxi[:, 2:3, :]
    J_cam_z = jnp.where(edges.has_depth[:, None, None], J_cam_z, 0.0)
    J_cam = jnp.concatenate([J_cam_uv, J_cam_z], axis=-2)   # [E, 3, 6]
    J_pt_uv = Jp2 @ R
    J_pt_z = w_d * R[:, 2:3, :]
    J_pt_z = jnp.where(edges.has_depth[:, None, None], J_pt_z, 0.0)
    J_pt = jnp.concatenate([J_pt_uv, J_pt_z], axis=-2)      # [E, 3, 3]

    bad = (xc[..., 2] <= 1e-3) | ~edges.valid
    r = jnp.where(bad[:, None], 0.0, r)
    J_cam = jnp.where(bad[:, None, None], 0.0, J_cam)
    J_pt = jnp.where(bad[:, None, None], 0.0, J_pt)
    return r, J_cam, J_pt


def robust_weights(cfg: SlamConfig, r, edges: BaEdges, delta: float):
    """IRLS edge weights: Huber(chi2) * info * valid."""
    chi2 = jnp.sum(r * r, axis=-1) * edges.info
    w = robust.huber_weight(chi2, delta) * edges.info
    return jnp.where(edges.valid, w, 0.0), chi2


def robust_cost(cfg: SlamConfig, poses, pts, edges: BaEdges, delta: float):
    r, _, _ = edge_residuals(cfg, poses, pts, edges)
    chi2 = jnp.sum(r * r, axis=-1) * edges.info
    return jnp.sum(jnp.where(edges.valid, robust.huber_cost(chi2, delta), 0.0))


def inv3x3(M):
    """Batched 3x3 inverse via adjugate (safe for SPD damped blocks)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            A, -(b * i - c * h), b * f - c * e,
            B, a * i - c * g, -(a * f - c * d),
            C, -(a * h - b * g), a * e - b * d,
        ],
        axis=-1,
    ).reshape(M.shape)
    return adj / det[..., None, None]
