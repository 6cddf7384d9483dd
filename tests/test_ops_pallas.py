"""Pallas kernel parity tests (interpret mode on CPU).

The fused projection-window Hamming matcher must reproduce the jnp
reference pipeline (hamming_matrix_mxu + window mask + match_top2)
bit-for-bit on the match indices/masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boslam_tpu.matching import hamming
from boslam_tpu.ops.hamming_pallas import fused_match_top2


def _random_problem(rng, n=128, m=512, img=(640.0, 480.0)):
    desc_a = jnp.asarray(
        rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    )
    desc_b = jnp.asarray(
        rng.integers(0, 2**32, size=(m, 8), dtype=np.uint32)
    )
    # Make some map descriptors near-copies of frame descriptors so real
    # matches exist under the Hamming threshold.
    idx = rng.integers(0, n, size=m // 4)
    desc_b = desc_b.at[: m // 4].set(desc_a[idx])
    uv_a = jnp.asarray(rng.uniform(0, img, size=(n, 2)).astype(np.float32))
    uv_b = jnp.asarray(rng.uniform(0, img, size=(m, 2)).astype(np.float32))
    # Co-locate the near-copies so the projection window passes for many.
    uv_b = uv_b.at[: m // 4].set(uv_a[idx] + 3.0)
    r_a = jnp.asarray(rng.uniform(8.0, 40.0, size=(n,)).astype(np.float32))
    valid_a = jnp.asarray(rng.random(n) < 0.9)
    vis_b = jnp.asarray(rng.random(m) < 0.8)
    return desc_a, uv_a, r_a, valid_a, desc_b, uv_b, vis_b


def _jnp_reference(desc_a, uv_a, r_a, valid_a, desc_b, uv_b, vis_b,
                   max_dist, ratio, mutual):
    dist = hamming.hamming_matrix_mxu(desc_a, desc_b)
    d2 = jnp.sum((uv_a[:, None, :] - uv_b[None, :, :]) ** 2, axis=-1)
    window = d2 <= (r_a[:, None] ** 2)
    return hamming.match_top2(
        dist, valid_a, vis_b, max_dist=max_dist, ratio=ratio,
        mutual=mutual, extra_mask=window,
    )


@pytest.mark.parametrize("mutual", [True, False])
@pytest.mark.parametrize("ratio", [1.0, 0.9])
def test_fused_match_parity(mutual, ratio):
    rng = np.random.default_rng(0)
    prob = _random_problem(rng)
    idx_ref, ok_ref, dist_ref = _jnp_reference(
        *prob, max_dist=64, ratio=ratio, mutual=mutual
    )
    idx, ok, dist = fused_match_top2(
        *prob, max_dist=64, ratio=ratio, mutual=mutual,
        m_tile=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    matched = np.asarray(ok_ref)
    np.testing.assert_array_equal(
        np.asarray(dist)[matched], np.asarray(dist_ref)[matched]
    )


def test_fused_match_infinite_radius():
    """r = inf disables the window: equals plain brute-force matching."""
    rng = np.random.default_rng(1)
    desc_a, uv_a, _, valid_a, desc_b, uv_b, vis_b = _random_problem(rng)
    r_inf = jnp.full((desc_a.shape[0],), jnp.inf, jnp.float32)
    dist = hamming.hamming_matrix_mxu(desc_a, desc_b)
    idx_ref, ok_ref, _ = hamming.match_top2(
        dist, valid_a, vis_b, max_dist=80, ratio=0.95, mutual=True
    )
    idx, ok, _ = fused_match_top2(
        desc_a, uv_a, r_inf, valid_a, desc_b, uv_b, vis_b,
        max_dist=80, ratio=0.95, mutual=True, m_tile=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))


# ---------------------------------------------------------------------------
# Frontend kernels (ops.frontend_pallas) vs their jnp golden twins.
# ---------------------------------------------------------------------------

def _frontend_frame():
    from boslam_tpu.config import CameraConfig
    from boslam_tpu.features.frontend import rgb_to_gray
    from boslam_tpu.io import synthetic

    cam = CameraConfig(width=320, height=240, fx=260.0, fy=260.0,
                       cx=160.0, cy=120.0)
    rgb, depth = synthetic.render_frame(
        cam, np.array([1.0, 0, 0, 0, 0.1, -0.1, 0.2])
    )
    return jnp.asarray(rgb_to_gray(rgb))


def test_fast_rank_pallas_matches_jnp():
    """Pallas FAST+NMS kernel == jnp reference (same accumulate order =>
    near bit-exact score maps; identical corner sets)."""
    from boslam_tpu.features.frontend import _BOOST_HI, _fast_rank_maps
    from boslam_tpu.ops.frontend_pallas import fast_rank_pallas

    gray = _frontend_frame()
    rank_ref, raw_ref = _fast_rank_maps(gray, 20.0, 7.0, 17)
    rank, raw = fast_rank_pallas(gray, 20.0, 7.0, _BOOST_HI, 17,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(raw_ref),
                               rtol=1e-5, atol=1e-3)
    # Same corners selected (rank support identical), scores near-equal.
    np.testing.assert_array_equal(np.asarray(rank) > 0,
                                  np.asarray(rank_ref) > 0)
    np.testing.assert_allclose(np.asarray(rank), np.asarray(rank_ref),
                               rtol=1e-5, atol=1e-3)


def test_fast_rank_pallas_ragged_height():
    """Heights that don't divide the row tile are zero-padded, not wrapped."""
    from boslam_tpu.features.frontend import _BOOST_HI, _fast_rank_maps
    from boslam_tpu.ops.frontend_pallas import fast_rank_pallas

    gray = _frontend_frame()[:230, :320]  # 230 % 64 != 0
    rank_ref, raw_ref = _fast_rank_maps(gray, 20.0, 7.0, 17)
    rank, raw = fast_rank_pallas(gray, 20.0, 7.0, _BOOST_HI, 17,
                                 interpret=True)
    assert rank.shape == rank_ref.shape
    np.testing.assert_allclose(np.asarray(rank), np.asarray(rank_ref),
                               rtol=1e-5, atol=1e-3)


def test_extract_patches_pallas_matches_jnp():
    from boslam_tpu.features.frontend import _extract_patches_jnp
    from boslam_tpu.ops.frontend_pallas import extract_patches_pallas

    gray = _frontend_frame()
    rng = np.random.default_rng(0)
    ys = jnp.asarray(rng.integers(17, 240 - 17, size=64), jnp.int32)
    xs = jnp.asarray(rng.integers(17, 320 - 17, size=64), jnp.int32)
    ref = _extract_patches_jnp(gray, ys, xs)
    out = extract_patches_pallas(gray, ys, xs, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_extract_features_pallas_matches_jnp():
    """Whole frontend, impl='pallas' (interpret) == impl='jnp': identical
    keypoints and descriptors."""
    from boslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
    from boslam_tpu.features import extract_features
    from boslam_tpu.features.frontend import rgb_to_gray
    from boslam_tpu.io import synthetic

    cam = CameraConfig(width=320, height=240, fx=260.0, fy=260.0,
                       cx=160.0, cy=120.0)
    rgb, depth = synthetic.render_frame(
        cam, np.array([1.0, 0, 0, 0, 0.1, -0.1, 0.2])
    )
    gray, depth = jnp.asarray(rgb_to_gray(rgb)), jnp.asarray(depth)
    cfg_j = SlamConfig(camera=cam, orb=OrbConfig(
        n_features=256, n_levels=4, frontend_impl="jnp"))
    cfg_p = SlamConfig(camera=cam, orb=OrbConfig(
        n_features=256, n_levels=4, frontend_impl="pallas"))
    fj = extract_features(gray, depth, cfg_j)
    fp = extract_features(gray, depth, cfg_p)
    np.testing.assert_array_equal(np.asarray(fp.valid), np.asarray(fj.valid))
    v = np.asarray(fj.valid)
    np.testing.assert_allclose(
        np.asarray(fp.uv)[v], np.asarray(fj.uv)[v], atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(fp.desc)[v], np.asarray(fj.desc)[v]
    )
    np.testing.assert_allclose(
        np.asarray(fp.angle)[v], np.asarray(fj.angle)[v], atol=1e-4
    )
