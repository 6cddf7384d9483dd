"""Solver unit tests on synthetic problems with known optima (SURVEY.md §4.2.2)."""

import numpy as np
import jax
import jax.numpy as jnp

from boslam_tpu.config import SlamConfig
from boslam_tpu.geometry import camera as cam_mod
from boslam_tpu.geometry import se3
from boslam_tpu.solvers import optimize_pose, pose_residuals, ransac_se3

CFG = SlamConfig()


def make_pnp_problem(rng, n=200, noise_px=0.0, outlier_frac=0.0, depth_frac=1.0):
    """Random world points + a groundtruth camera; returns observation arrays."""
    cam = CFG.camera
    pose_gt = se3.exp(jnp.asarray(rng.normal(size=6) * np.array([0.1] * 3 + [0.3] * 3)))
    # Points in front of the camera: sample in camera frame, move to world.
    xc = np.stack(
        [rng.uniform(-1.5, 1.5, n), rng.uniform(-1.1, 1.1, n), rng.uniform(1.0, 6.0, n)],
        -1,
    )
    pts_w = np.asarray(se3.pose_apply(se3.pose_inv(pose_gt)[None], jnp.asarray(xc)))
    uv = np.asarray(cam_mod.project(cam, jnp.asarray(xc))).copy()
    depth = xc[:, 2].copy()
    uv += rng.normal(size=uv.shape) * noise_px
    n_out = int(outlier_frac * n)
    if n_out:
        uv[:n_out] = np.stack(
            [rng.uniform(0, cam.width, n_out), rng.uniform(0, cam.height, n_out)], -1
        )
        depth[:n_out] = rng.uniform(0.5, 7.0, n_out)
    has_depth = rng.uniform(size=n) < depth_frac
    in_img = (
        (uv[:, 0] >= 0) & (uv[:, 0] < cam.width) & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
    )
    return pose_gt, jnp.asarray(pts_w), jnp.asarray(uv), jnp.asarray(depth), jnp.asarray(
        has_depth
    ), jnp.asarray(in_img)


def pose_err(pose, pose_gt):
    dr, dt = se3.pose_distance(pose, pose_gt)
    return float(dr), float(dt)


def test_pose_residuals_zero_at_gt(rng):
    pose_gt, pts, uv, depth, hd, mask = make_pnp_problem(rng)
    r, J = pose_residuals(CFG, pose_gt, pts, uv, depth, hd)
    assert float(jnp.max(jnp.abs(r * mask[:, None]))) < 1e-2


def test_pose_jacobian_matches_autodiff(rng):
    pose_gt, pts, uv, depth, hd, _ = make_pnp_problem(rng, n=32)

    def res_fn(xi):
        r, _ = pose_residuals(CFG, se3.retract(pose_gt, xi), pts, uv, depth, hd)
        return r

    J_auto = jax.jacobian(res_fn)(jnp.zeros(6))
    _, J_ana = pose_residuals(CFG, pose_gt, pts, uv, depth, hd)
    np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_ana), atol=2e-2, rtol=1e-3)


def test_optimize_pose_clean(rng):
    pose_gt, pts, uv, depth, hd, mask = make_pnp_problem(rng, noise_px=0.0)
    pose0 = se3.retract(pose_gt, jnp.asarray([0.02, -0.03, 0.01, 0.05, -0.08, 0.1]))
    res = optimize_pose(CFG, pose0, pts, uv, depth, hd, mask)
    dr, dt = pose_err(res.pose, pose_gt)
    assert dr < 1e-3 and dt < 2e-3, (dr, dt)
    assert int(res.n_inliers) > 150


def test_optimize_pose_with_outliers(rng):
    pose_gt, pts, uv, depth, hd, mask = make_pnp_problem(
        rng, noise_px=0.5, outlier_frac=0.3
    )
    pose0 = se3.retract(pose_gt, jnp.asarray([0.02, -0.01, 0.02, 0.05, 0.05, -0.05]))
    res = optimize_pose(CFG, pose0, pts, uv, depth, hd, mask)
    dr, dt = pose_err(res.pose, pose_gt)
    assert dr < 5e-3 and dt < 1e-2, (dr, dt)
    # Outliers gated out.
    inl = np.asarray(res.inliers)
    assert inl[: int(0.3 * 200)].mean() < 0.2
    assert inl[int(0.3 * 200) :].mean() > 0.8


def test_optimize_pose_mono_edges_only(rng):
    """No depth on any edge -> pure reprojection refinement still converges."""
    pose_gt, pts, uv, depth, hd, mask = make_pnp_problem(rng, depth_frac=0.0)
    pose0 = se3.retract(pose_gt, jnp.asarray([0.01, 0.02, -0.01, 0.03, -0.02, 0.04]))
    res = optimize_pose(CFG, pose0, pts, uv, depth, hd, mask)
    dr, dt = pose_err(res.pose, pose_gt)
    assert dr < 2e-3 and dt < 5e-3, (dr, dt)


def test_ransac_se3_clean(rng):
    src = jnp.asarray(rng.normal(size=(100, 3)))
    T_gt = se3.exp(jnp.asarray(rng.normal(size=6) * 0.5))
    dst = se3.pose_apply(T_gt[None], src)
    res = ransac_se3(src, dst, jnp.ones(100, bool), jax.random.key(0))
    assert bool(res.ok)
    dr, dt = pose_err(res.pose, T_gt)
    assert dr < 1e-3 and dt < 1e-3


def test_ransac_se3_outliers(rng):
    n = 120
    src = rng.normal(size=(n, 3))
    T_gt = se3.exp(jnp.asarray(rng.normal(size=6) * 0.5))
    dst = np.asarray(se3.pose_apply(T_gt[None], jnp.asarray(src))).copy()
    dst[:50] = rng.normal(size=(50, 3)) * 3  # ~40% outliers
    res = ransac_se3(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(n, bool), jax.random.key(1),
        threshold=0.05,
    )
    assert bool(res.ok)
    dr, dt = pose_err(res.pose, T_gt)
    assert dr < 5e-3 and dt < 5e-3
    assert np.asarray(res.inliers)[:50].mean() < 0.1


def test_ransac_se3_respects_mask(rng):
    n = 60
    src = rng.normal(size=(n, 3))
    T_gt = se3.exp(jnp.asarray([0.1, -0.2, 0.15, 0.4, 0.1, -0.3]))
    dst = np.asarray(se3.pose_apply(T_gt[None], jnp.asarray(src))).copy()
    dst[30:] = 1e3  # garbage, but masked away
    mask = np.arange(n) < 30
    res = ransac_se3(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask), jax.random.key(2))
    dr, dt = pose_err(res.pose, T_gt)
    assert dr < 1e-3 and dt < 1e-3
    assert int(res.n_inliers) == 30


def test_ransac_pnp_reprojection_scored(rng):
    """ransac_pnp recovers a pose from 2D-3D matches with 30% outliers and
    depth on only half the keypoints (reference solvePnPRansac role)."""
    import numpy as np
    from boslam_tpu.config import SlamConfig
    from boslam_tpu.geometry import camera as cam_mod
    from boslam_tpu.geometry import se3
    from boslam_tpu.solvers import ransac_pnp

    cfg = SlamConfig()
    cam = cfg.camera
    n = 200
    pts_w = jnp.asarray(np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(2, 6, n)
    ], -1).astype(np.float32))
    gt = se3.exp(jnp.asarray(np.array([0.05, -0.03, 0.02, 0.1, -0.05, 0.15])))
    xc = se3.pose_apply(gt[None], pts_w)
    uv = cam_mod.project(cam, xc)
    uv = uv + jnp.asarray(rng.normal(0, 0.3, (n, 2)).astype(np.float32))
    has_depth = jnp.asarray(rng.uniform(size=n) < 0.5)
    xyz_cam = jnp.where(has_depth[:, None], xc, 0.0)
    # 30% outliers: scramble their pixels.
    out_mask = rng.uniform(size=n) < 0.3
    uv = jnp.where(jnp.asarray(out_mask)[:, None],
                   jnp.asarray(rng.uniform(0, 400, (n, 2)).astype(np.float32)), uv)
    res = ransac_pnp(cfg, pts_w, uv, xyz_cam, has_depth,
                     jnp.ones(n, bool), jax.random.key(0))
    assert bool(res.ok)
    dr, dt = se3.pose_distance(res.pose[None], gt[None])
    assert float(dt[0]) < 5e-3 and float(dr[0]) < 5e-3
    # Outliers excluded from the consensus, inliers retained.
    inl = np.asarray(res.inliers)
    assert inl[~out_mask].mean() > 0.9
    assert inl[out_mask].mean() < 0.1


def test_sample_triples_distinct_and_total(rng):
    """Minimal-set sampling: no duplicate indices within a triple (degenerate
    Umeyama), and all-zero weights fall back to uniform instead of NaN."""
    import jax
    from boslam_tpu.solvers.ransac import _sample_triples

    key = jax.random.key(3)
    w = jnp.zeros(64).at[5].set(1.0).at[17].set(1.0).at[40].set(2.0).at[63].set(1.0)
    idx = np.asarray(_sample_triples(key, w, 256))
    assert idx.shape == (256, 3)
    for row in idx:
        assert len(set(row.tolist())) == 3, f"duplicate indices in {row}"
        assert set(row.tolist()) <= {5, 17, 40, 63}
    # All-zero weights: still valid distinct triples (uniform fallback).
    idx0 = np.asarray(_sample_triples(key, jnp.zeros(64), 64))
    assert np.isfinite(idx0).all()
    for row in idx0:
        assert len(set(row.tolist())) == 3
