"""Projection-guided matching of frame keypoints to map points.

Reference ``search_by_projection`` (SURVEY.md §2.1 "Matcher"): project a map
point into the frame with the predicted pose, then search keypoints within a
radius scaled by octave.  TPU-first redesign: instead of per-point candidate
lists, compute the full keypoints x points Hamming matrix on the MXU and mask
it by the projection window — one batched op over the whole map, no gather
chasing (SURVEY.md §7.1 step 3).
"""

from __future__ import annotations

import jax.numpy as jnp

from boslam_tpu.config import SlamConfig
from boslam_tpu.geometry import camera as cam_mod
from boslam_tpu.geometry import se3
from boslam_tpu.matching import hamming
from boslam_tpu.matching.rotation import rotation_consistency


def project_points(cfg: SlamConfig, pose_cw, pt_xyz, pt_valid):
    """Project world points into the camera.

    Returns (uv [P, 2], z_cam [P], visible [P]): in front of the camera,
    inside the image, and within the depth validity range.
    """
    cam = cfg.camera
    xc = se3.pose_apply(pose_cw[None, :], pt_xyz)
    uv = cam_mod.project(cam, xc)
    z = xc[..., 2]
    vis = (
        pt_valid
        & (z > cam.depth_min)
        & (z < cam.depth_max)
        & cam_mod.in_image(cam, uv, border=1.0)
    )
    return uv, z, vis


def search_by_projection(
    cfg: SlamConfig,
    feats,
    pose_cw,
    pt_xyz,
    pt_desc,
    pt_valid,
    radius: float,
    max_dist: int,
    ratio: float | None = None,
    mutual: bool = True,
    pt_angle=None,
):
    """Match frame keypoints to map points under a predicted pose.

    Args:
      feats: FrameFeatures of the current frame.
      pose_cw: [7] predicted world->camera pose.
      pt_xyz: [P, 3] world positions; pt_desc: [P, 8] u32; pt_valid: [P] bool.
      radius: base search radius in pixels (scaled by keypoint octave).

    Returns:
      (match_idx [N] int32 point index or -1, match_mask [N] bool,
       visible [P] bool, match_dist [N] i32)
    """
    mcfg = cfg.matcher
    uv_proj, z, vis = project_points(cfg, pose_cw, pt_xyz, pt_valid)
    # Octave-scaled window around each keypoint.
    scale = cfg.orb.scale_factor ** feats.octave.astype(jnp.float32)
    r = radius * scale  # [N]
    d2 = jnp.sum((feats.uv[:, None, :] - uv_proj[None, :, :]) ** 2, axis=-1)
    window = (d2 <= (r[:, None] ** 2)) & vis[None, :]
    dist = hamming.hamming_matrix_mxu(feats.desc, pt_desc)
    idx, ok, mdist = hamming.match_top2(
        dist,
        feats.valid,
        vis,
        max_dist=max_dist,
        ratio=mcfg.ratio if ratio is None else ratio,
        mutual=mutual,
        extra_mask=window,
    )
    if pt_angle is not None:
        # Rotation-consistency histogram: mismatches scatter in relative
        # orientation while true matches share the camera-roll offset.
        matched_angle = pt_angle[jnp.clip(idx, 0, pt_angle.shape[0] - 1)]
        keep = rotation_consistency(feats.angle, matched_angle, ok)
        idx = jnp.where(keep, idx, -1)
        ok = keep
    return idx, ok, vis, mdist
