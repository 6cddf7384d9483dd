"""Rotation-consistency histogram filter (reference Matcher row, SURVEY.md
§2.1: "rotation-consistency histogram filtering").

ORB keypoint orientations rotate rigidly with camera roll, so the angle
difference of every CORRECT match falls in the same few histogram bins while
mismatches scatter uniformly.  The reference builds a 30-bin histogram of
match angle differences and keeps only matches in the 3 most populated bins;
here that is a segment-sum histogram + a top-k mask — fully batched, no
Python loops, vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 6.283185307179586


def rotation_consistency(
    angle_a: jnp.ndarray,
    angle_b: jnp.ndarray,
    ok: jnp.ndarray,
    n_bins: int = 30,
    keep_top: int = 3,
    min_matches: int = 12,
) -> jnp.ndarray:
    """Filter matches by dominant relative rotation.

    Args:
      angle_a: [N] f32 orientation of the keypoint on side A (radians).
      angle_b: [N] f32 orientation of the MATCHED feature on side B (for
        unmatched slots any value; they are masked by ``ok``).
      ok: [N] bool candidate match mask.
      n_bins / keep_top: histogram resolution and retained bins (reference
        defaults 30 / 3).
      min_matches: below this many candidates the filter is a no-op — a tiny
        histogram carries no signal and would erase a sparse but valid set.

    Returns the refined [N] bool mask.
    """
    rot = jnp.mod(angle_a - angle_b, TWO_PI)
    binw = TWO_PI / n_bins
    b = jnp.clip((rot / binw).astype(jnp.int32), 0, n_bins - 1)
    seg = jnp.where(ok, b, n_bins)
    hist = jax.ops.segment_sum(
        jnp.ones_like(seg, jnp.float32), seg, num_segments=n_bins + 1
    )[:n_bins]
    thresh = jnp.sort(hist)[-keep_top]
    good_bin = hist >= jnp.maximum(thresh, 1.0)
    keep = ok & good_bin[b]
    return jnp.where(jnp.sum(ok) >= min_matches, keep, ok)
