"""Feature frontend tests: golden repeatability vs cv2 FAST/ORB (SURVEY.md
§4.2.1) and behavior-level descriptor tests on the synthetic renderer."""

import numpy as np
import pytest
import jax.numpy as jnp

from boslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from boslam_tpu.features import extract_features
from boslam_tpu.features.frontend import distribute_features, rgb_to_gray
from boslam_tpu.io import synthetic
from boslam_tpu.matching import hamming

CAM = CameraConfig(width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0)
CFG = SlamConfig(camera=CAM, orb=OrbConfig(n_features=256, n_levels=4))


@pytest.fixture(scope="module")
def frame():
    pose = np.array([1.0, 0, 0, 0, 0.1, -0.1, 0.2])
    rgb, depth = synthetic.render_frame(CAM, pose)
    return rgb_to_gray(rgb), depth


def test_distribute_features():
    ks = distribute_features(512, 8, 1.2)
    assert sum(ks) == 512
    assert all(k >= 8 for k in ks)
    assert ks[0] > ks[-1]


def test_extract_shapes_and_masks(frame):
    gray, depth = frame
    f = extract_features(jnp.asarray(gray), jnp.asarray(depth), CFG)
    n = CFG.orb.n_features
    assert f.uv.shape == (n, 2) and f.desc.shape == (n, 8)
    assert f.desc.dtype == jnp.uint32
    nv = int(jnp.sum(f.valid))
    assert nv > 100, f"too few keypoints: {nv}"
    # valid keypoints inside the image
    uv = np.asarray(f.uv)[np.asarray(f.valid)]
    assert uv[:, 0].min() >= 0 and uv[:, 0].max() < CAM.width
    assert uv[:, 1].min() >= 0 and uv[:, 1].max() < CAM.height
    # depth-backed keypoints backproject consistently
    hd = np.asarray(f.has_depth)
    assert hd.sum() > 50
    np.testing.assert_allclose(
        np.asarray(f.xyz)[hd, 2], np.asarray(f.depth)[hd], atol=1e-5
    )


def test_repeatability_vs_cv2(frame):
    """>= 45% of our valid keypoints lie within 3 px of a cv2 ORB keypoint.

    Measured 0.46-0.51 across poses (r3).  The residual divergence from
    cv2 is structural, not noise — three deliberate design differences:
    (1) our grid policy fills weak cells with LOW-threshold corners cv2's
    quadtree would never emit (adaptive dual-threshold, reference ORB
    per-cell retry); (2) cv2 ORB re-ranks FAST corners by Harris response
    while we rank by FAST intensity margin; (3) our per-cell quota caps
    dense cells harder at this budget.  Keypoints the two detectors DO
    share localize to sub-pixel agreement (the @2px fraction is within
    5 points of @3px), so the overlap set is tight — the complement is
    policy, which the behavioral tests below (matching, geometry) cover."""
    cv2 = pytest.importorskip("cv2")
    gray, depth = frame
    f = extract_features(jnp.asarray(gray), jnp.asarray(depth), CFG)
    ours = np.asarray(f.uv)[np.asarray(f.valid)]
    orb = cv2.ORB_create(nfeatures=512, scaleFactor=1.2, nlevels=4, fastThreshold=20)
    kps = orb.detect(gray.astype(np.uint8), None)
    assert len(kps) > 50
    theirs = np.array([k.pt for k in kps])
    d = np.linalg.norm(ours[:, None, :] - theirs[None, :, :], axis=-1).min(axis=1)
    frac = float((d <= 3.0).mean())
    assert frac >= 0.45, f"repeatability {frac:.2f}"


def test_descriptor_invariance_under_motion(frame):
    """Descriptors must match across a small camera motion with geometric
    consistency (behavioral golden: matching works end-to-end)."""
    gray0, depth0 = frame
    pose1 = np.array([1.0, 0, 0, 0, 0.15, -0.1, 0.2])  # 5cm lateral shift
    rgb1, depth1 = synthetic.render_frame(CAM, pose1)
    gray1 = rgb_to_gray(rgb1)
    f0 = extract_features(jnp.asarray(gray0), jnp.asarray(depth0), CFG)
    f1 = extract_features(jnp.asarray(gray1), jnp.asarray(depth1), CFG)
    dist = hamming.hamming_matrix(f0.desc, f1.desc)
    idx, ok, _ = hamming.match_top2(dist, f0.valid, f1.valid, max_dist=64, ratio=0.9)
    n_matches = int(jnp.sum(ok))
    assert n_matches >= 40, f"only {n_matches} matches"
    # Geometric consistency: matched kp in frame1 = projection of frame0's
    # backprojected point shifted by -0.05m in x.
    m = np.asarray(ok) & np.asarray(f0.has_depth)
    assert m.sum() >= 20
    xyz0 = np.asarray(f0.xyz)[m]
    xc1 = xyz0 + np.array([0.1, -0.1, 0.2]) - np.array([0.15, -0.1, 0.2])
    uv_pred = np.stack(
        [
            CAM.fx * xc1[:, 0] / xc1[:, 2] + CAM.cx,
            CAM.fy * xc1[:, 1] / xc1[:, 2] + CAM.cy,
        ],
        -1,
    )
    uv1 = np.asarray(f1.uv)[np.asarray(idx)[m]]
    err = np.linalg.norm(uv_pred - uv1, axis=-1)
    assert np.median(err) < 2.0, f"median reproj err {np.median(err):.2f}px"


def test_orientation_rotates_with_image(frame):
    """Keypoint angles are finite and distributed (not all zero)."""
    gray, depth = frame
    f = extract_features(jnp.asarray(gray), jnp.asarray(depth), CFG)
    ang = np.asarray(f.angle)[np.asarray(f.valid)]
    assert np.all(np.isfinite(ang))
    assert ang.std() > 0.5


def test_grid_spatial_distribution(frame):
    """Grid-bucketed selection spreads keypoints over the image (reference
    ORB grid/quadtree policy): most grid cells must hold a keypoint, and no
    cell may hog the budget."""
    gray, depth = frame
    f = extract_features(jnp.asarray(gray), jnp.asarray(depth), CFG)
    v = np.asarray(f.valid)
    uv = np.asarray(f.uv)[v]
    R, C = CFG.orb.grid_rows, CFG.orb.grid_cols
    gx = np.clip((uv[:, 0] / CAM.width * C).astype(int), 0, C - 1)
    gy = np.clip((uv[:, 1] / CAM.height * R).astype(int), 0, R - 1)
    cell = gy * C + gx
    counts = np.bincount(cell, minlength=R * C)
    occupied = int((counts > 0).sum())
    assert occupied >= R * C // 2, f"only {occupied}/{R*C} cells occupied"
    assert counts.max() <= max(8, 4 * v.sum() // (R * C)), "one cell hogs the budget"
