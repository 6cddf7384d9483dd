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
