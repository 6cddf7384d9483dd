"""RANSAC 3D-3D SE3 alignment, fully vmapped.

Replaces ``cv2.solvePnPRansac`` for the RGBD case (SURVEY.md §2.2: "JAX
RANSAC-PnP: vmap over K hypothesis minimal sets ... inlier counting, argmax").
With per-keypoint depth both sides of a correspondence are 3D, so the minimal
solver is closed-form Umeyama on 3 points (the reference's "PnP/ICP" path,
BASELINE.json north_star) — no iterative minimal solver needed.  Used for
map initialization fallback, relocalization, and loop-closure geometric
verification (SURVEY.md §3.4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from boslam_tpu.geometry import se3


def _sample_triples(key, weights, n_hypotheses: int):
    """[H, 3] index triples, sampled ∝ weights WITHOUT replacement per triple
    (Gumbel top-k).  Duplicate indices inside a minimal set make the Umeyama
    hypothesis degenerate, and all-zero weights are undefined for
    jax.random.choice — a uniform fallback keeps the sampler total."""
    n = weights.shape[0]
    w = jnp.where(jnp.sum(weights) > 0, weights, jnp.ones_like(weights))
    g = jax.random.gumbel(key, (n_hypotheses, n))
    scores = jnp.where(w[None, :] > 0, jnp.log(w)[None, :] + g, -jnp.inf)
    return jax.lax.top_k(scores, 3)[1]


def umeyama_fixed_scale(src, dst, w):
    """Weighted closed-form SE3: dst ≈ R src + t.  src/dst [N, 3], w [N]."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    wn = w / wsum
    mu_s = jnp.sum(wn[:, None] * src, axis=0)
    mu_d = jnp.sum(wn[:, None] * dst, axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * wn[:, None]).T @ sc
    U, _, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.stack([1.0, 1.0, d]))
    R = U @ D @ Vt
    t = mu_d - R @ mu_s
    return se3.make_pose(se3.mat_to_quat(R), t)


class RansacResult(NamedTuple):
    pose: jnp.ndarray       # [7] best T with dst ≈ T(src)
    inliers: jnp.ndarray    # [N] bool
    n_inliers: jnp.ndarray  # scalar i32
    ok: jnp.ndarray         # scalar bool (enough inliers found)


@functools.partial(jax.jit, static_argnums=(0, 7, 9))
def ransac_pnp(
    cfg,
    pts_w,
    uv,
    xyz_cam,
    has_depth,
    mask,
    key,
    n_hypotheses: int = 128,
    threshold: float = None,
    min_inliers: int = 12,
) -> RansacResult:
    """RANSAC PnP: 2D-3D pose with REPROJECTION-scored consensus.

    Replaces ``cv2.solvePnPRansac`` (SURVEY.md §2.2): hypotheses come from
    minimal 3-point 3D-3D alignments on depth-backed correspondences (the
    RGBD privilege — no polynomial P3P needed), but the consensus set is
    scored by PIXEL reprojection of ALL matched keypoints, so depthless
    keypoints vote too and the inlier bound is the config's
    ``tracker.ransac_threshold`` pixels.

    Args:
      pts_w: [N, 3] matched world points; uv: [N, 2] observed pixels;
      xyz_cam: [N, 3] camera-frame backprojections (0 where no depth);
      has_depth: [N] bool; mask: [N] bool valid correspondences.
    """
    from boslam_tpu.geometry import camera as cam_mod

    px = cfg.tracker.ransac_threshold if threshold is None else threshold
    n = pts_w.shape[0]
    m3 = (mask & has_depth).astype(jnp.float32)
    idx = _sample_triples(key, m3, n_hypotheses)

    def score(pose):
        xc = se3.pose_apply(pose[None], pts_w)
        uv_pred = cam_mod.project(cfg.camera, xc)
        err = jnp.linalg.norm(uv_pred - uv, axis=-1)
        return (err < px) & (xc[..., 2] > 1e-3) & mask

    def hypothesis(tri):
        pose = umeyama_fixed_scale(pts_w[tri], xyz_cam[tri], jnp.ones(3))
        return jnp.sum(score(pose)), pose

    scores, poses = jax.vmap(hypothesis)(idx)
    best = jnp.argmax(scores)
    pose = poses[best]
    # Refine on the 3D-capable subset of the winning 2D consensus.
    for _ in range(2):
        w = (score(pose) & has_depth).astype(jnp.float32)
        pose = umeyama_fixed_scale(pts_w, xyz_cam, w + 1e-9)
    inliers = score(pose)
    n_inl = jnp.sum(inliers).astype(jnp.int32)
    return RansacResult(pose, inliers, n_inl, n_inl >= min_inliers)


@functools.partial(jax.jit, static_argnums=(4, 6))
def ransac_se3(
    src,
    dst,
    mask,
    key,
    n_hypotheses: int = 128,
    threshold: float = 0.1,
    min_inliers: int = 12,
) -> RansacResult:
    """Robust SE3 from 3D-3D correspondences.

    Args:
      src, dst: [N, 3] corresponding points (masked).
      mask: [N] bool valid correspondences.
      key: PRNG key.
      threshold: inlier 3D distance bound (metres) — scalar or [N]
        per-correspondence radii (e.g. depth-adaptive for RGBD noise).

    All hypotheses are evaluated in parallel with vmap; the winner is refined
    by one weighted Umeyama on its inliers.
    """
    n = src.shape[0]
    maskf = mask.astype(jnp.float32)
    # Minimal sets sampled without replacement over valid correspondences.
    idx = _sample_triples(key, maskf, n_hypotheses)

    def hypothesis(tri):
        w3 = jnp.ones(3)
        pose = umeyama_fixed_scale(src[tri], dst[tri], w3)
        err = jnp.linalg.norm(se3.pose_apply(pose[None], src) - dst, axis=-1)
        inl = (err < threshold) & mask
        return jnp.sum(inl), pose

    scores, poses = jax.vmap(hypothesis)(idx)
    best = jnp.argmax(scores)
    pose = poses[best]
    # Refine on the winning consensus set (two Umeyama re-fits).
    for _ in range(2):
        err = jnp.linalg.norm(se3.pose_apply(pose[None], src) - dst, axis=-1)
        w = ((err < threshold) & mask).astype(jnp.float32)
        pose = umeyama_fixed_scale(src, dst, w + 1e-9)
    err = jnp.linalg.norm(se3.pose_apply(pose[None], src) - dst, axis=-1)
    inliers = (err < threshold) & mask
    n_inl = jnp.sum(inliers).astype(jnp.int32)
    return RansacResult(pose, inliers, n_inl, n_inl >= min_inliers)
