"""ORB-style feature frontend, pure jnp (Pallas upgrades live in ops/).

TPU-native replacement for ``cv2.ORB_create(...).detectAndCompute`` (reference
frame construction, SURVEY.md §2.2 row "OpenCV ORB"): 8-level image pyramid,
FAST-9 corner test with SAD score, 3x3 NMS, per-level top-k with a fixed
feature budget, intensity-centroid orientation, rotated-BRIEF 256-bit
descriptors packed as uint32[8], and per-keypoint depth backprojection
(reference camera.py contract, SURVEY.md §2.1).

Everything is static-shape: exactly ``cfg.orb.n_features`` keypoint slots per
frame, invalid slots masked (SURVEY.md §7.0).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from boslam_tpu.config import SlamConfig
from boslam_tpu.features.pattern import HALF, PATCH, PATTERN
from boslam_tpu.geometry import camera as cam_mod

# FAST radius-3 Bresenham circle, (dx, dy), clockwise from 12 o'clock.
_CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    np.int32,
)

_LEVEL_BORDER = 17  # circle radius 3 + descriptor patch half 15 (rounded up)


class FrameFeatures(NamedTuple):
    """Per-frame feature set; all arrays have leading dim n_features."""

    uv: jnp.ndarray        # [N, 2] f32, level-0 pixel coords
    xyz: jnp.ndarray       # [N, 3] f32, camera-frame backprojection (0 if no depth)
    depth: jnp.ndarray     # [N] f32 metres (0 if invalid)
    desc: jnp.ndarray      # [N, 8] uint32 packed 256-bit descriptors
    angle: jnp.ndarray     # [N] f32 radians
    octave: jnp.ndarray    # [N] i32 pyramid level
    response: jnp.ndarray  # [N] f32 FAST score
    valid: jnp.ndarray     # [N] bool
    has_depth: jnp.ndarray # [N] bool


def distribute_features(n: int, n_levels: int, scale: float) -> List[int]:
    """Per-level keypoint budgets, geometric decay by 1/scale (ORB policy)."""
    inv = [1.0 / scale**l for l in range(n_levels)]
    total = sum(inv)
    ks = [max(8, int(round(n * w / total))) for w in inv]
    ks[0] += n - sum(ks)
    return ks


def pyramid_shapes(h: int, w: int, n_levels: int, scale: float):
    return [
        (max(int(round(h / scale**l)), 64), max(int(round(w / scale**l)), 64))
        for l in range(n_levels)
    ]


def _gauss7(sigma: float = 2.0) -> np.ndarray:
    x = np.arange(-3, 4, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable 7-tap Gaussian, SAME padding (edge replicate)."""
    pad = 3
    p = jnp.pad(img, ((pad, pad), (0, 0)), mode="edge")
    img = sum(kernel[i] * p[i : i + img.shape[0], :] for i in range(7))
    p = jnp.pad(img, ((0, 0), (pad, pad)), mode="edge")
    return sum(kernel[i] * p[:, i : i + img.shape[1]] for i in range(7))


def _fast_score(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9 corner score map (SAD-of-margins variant).

    A pixel is a corner if >= 9 contiguous circle pixels are all brighter than
    c + t or all darker than c - t; the score is the summed intensity margin
    of the triggering polarity (a standard FAST reimplementation score; golden
    parity with cv2 is asserted by keypoint repeatability, not exact scores --
    SURVEY.md §4.2.1).
    """
    return _fast_scores(img, (threshold,))[0]


def _fast_scores(img: jnp.ndarray, thresholds) -> list:
    """FAST-9 score maps at several thresholds, sharing the circle-shift
    stack (the adaptive-threshold path needs hi + lo in one pass)."""
    shifted = jnp.stack(
        [jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1)) for dx, dy in _CIRCLE]
    )  # [16, H, W]

    def contig9(m):
        acc = m
        for k in range(1, 9):
            acc = acc & jnp.roll(m, -k, axis=0)
        return jnp.any(acc, axis=0)

    out = []
    for t in thresholds:
        bright = shifted > img[None] + t
        dark = shifted < img[None] - t
        is_b = contig9(bright)
        is_d = contig9(dark)
        margin_b = jnp.sum(jnp.where(bright, shifted - img[None] - t, 0.0), 0)
        margin_d = jnp.sum(jnp.where(dark, img[None] - t - shifted, 0.0), 0)
        out.append(jnp.maximum(is_b * margin_b, is_d * margin_d))
    return out


def _nms3(score: jnp.ndarray) -> jnp.ndarray:
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((score >= mx) & (score > 0), score, 0.0)


def _border_mask(h: int, w: int, b: int) -> np.ndarray:
    m = np.zeros((h, w), np.float32)
    m[b : h - b, b : w - b] = 1.0
    return m


# Rank boosts for the grid-distributed selection.  Raw FAST scores are
# intensity margins < 16*255 = 4080, so these separate cleanly in f32.
_BOOST_HI = float(1 << 17)    # high-threshold corner beats any low-threshold one
_BOOST_CELL = float(1 << 18)  # per-cell best beats everything (>=1 kp/cell)


def _grid_select(rank: jnp.ndarray, k: int, rows: int, cols: int):
    """Spatially distributed top-k (reference ORB grid/quadtree policy,
    SURVEY.md §2.2 ORB row).

    ``rank`` is a [H, W] ranking map (0 = no corner).  Selection: per grid
    cell take the top-q candidates (q caps any cell at ~2x its fair share),
    boost each cell's best by _BOOST_CELL so every occupied cell places at
    least one keypoint before any cell places two, then global top-k.

    Returns (ys [k], xs [k], chosen_rank [k]).
    """
    h, w = rank.shape
    n_cells = rows * cols
    ch = -(-h // rows)
    cw = -(-w // cols)
    q = min(max(2, -(-2 * k // n_cells)), k)
    padded = jnp.zeros((rows * ch, cols * cw), rank.dtype).at[:h, :w].set(rank)
    cells = padded.reshape(rows, ch, cols, cw).transpose(0, 2, 1, 3).reshape(
        n_cells, ch * cw
    )
    topv, topi = jax.lax.top_k(cells, q)                     # [n_cells, q]
    topv = topv.at[:, 0].add(jnp.where(topv[:, 0] > 0, _BOOST_CELL, 0.0))
    cell_r = jnp.arange(n_cells) // cols
    cell_c = jnp.arange(n_cells) % cols
    ys = cell_r[:, None] * ch + topi // cw                   # [n_cells, q]
    xs = cell_c[:, None] * cw + topi % cw
    flat_v = jnp.where(topv > 0, topv, 0.0).reshape(-1)
    best, sel = jax.lax.top_k(flat_v, k)
    return ys.reshape(-1)[sel], xs.reshape(-1)[sel], best


def _subpixel_offsets(score, ys, xs):
    """Per-keypoint sub-pixel offsets from a 1D parabola fit per axis on the
    raw (pre-NMS) FAST score map; clamped to [-0.5, 0.5]."""

    def one(y, x):
        p = jax.lax.dynamic_slice(score, (y - 1, x - 1), (3, 3))
        c = p[1, 1]

        def fit(lo, hi):
            denom = 2.0 * c - lo - hi
            off = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (hi - lo) / denom, 0.0)
            return jnp.clip(off, -0.5, 0.5)

        return fit(p[1, 0], p[1, 2]), fit(p[0, 1], p[2, 1])

    return jax.vmap(one)(ys, xs)


def _orientation_and_desc(level_img, ys, xs, pattern):
    """Per-keypoint orientation (intensity centroid) + rotated BRIEF bits.

    level_img: [H, W] blurred level image; ys/xs: [K] int keypoint coords.
    Returns (angle [K], desc [K, 8] uint32).
    """
    dy, dx = np.mgrid[-HALF : HALF + 1, -HALF : HALF + 1]
    circ = (dx**2 + dy**2 <= HALF**2).astype(np.float32)
    wx = jnp.asarray(dx * circ)
    wy = jnp.asarray(dy * circ)

    def one(y, x):
        patch = jax.lax.dynamic_slice(
            level_img, (y - HALF, x - HALF), (PATCH, PATCH)
        )
        m10 = jnp.sum(wx * patch)
        m01 = jnp.sum(wy * patch)
        angle = jnp.arctan2(m01, m10)
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        # Rotate the sampling pattern (steered BRIEF).
        x1 = pattern[:, 0] * ca - pattern[:, 1] * sa
        y1 = pattern[:, 0] * sa + pattern[:, 1] * ca
        x2 = pattern[:, 2] * ca - pattern[:, 3] * sa
        y2 = pattern[:, 2] * sa + pattern[:, 3] * ca
        i1 = jnp.round(y1).astype(jnp.int32) + HALF
        j1 = jnp.round(x1).astype(jnp.int32) + HALF
        i2 = jnp.round(y2).astype(jnp.int32) + HALF
        j2 = jnp.round(x2).astype(jnp.int32) + HALF
        v1 = patch[i1, j1]
        v2 = patch[i2, j2]
        bits = (v1 < v2).astype(jnp.uint32)  # [256]
        packed = jnp.sum(
            bits.reshape(8, 32) << jnp.arange(32, dtype=jnp.uint32)[None, :],
            axis=1,
            dtype=jnp.uint32,
        )
        return angle, packed

    return jax.vmap(one)(ys, xs)


@functools.partial(jax.jit, static_argnums=(2,))
def extract_features(gray, depth, cfg: SlamConfig) -> FrameFeatures:
    """gray: [H, W] f32 in [0, 255]; depth: [H, W] f32 metres (0 = invalid)."""
    orb = cfg.orb
    cam = cfg.camera
    h, w = cam.height, cam.width
    shapes = pyramid_shapes(h, w, orb.n_levels, orb.scale_factor)
    budgets = distribute_features(orb.n_features, orb.n_levels, orb.scale_factor)
    kernel = jnp.asarray(_gauss7())
    pattern = jnp.asarray(PATTERN)

    uv_all, ang_all, desc_all, oct_all, resp_all, val_all = [], [], [], [], [], []
    level = gray
    for l, (hl, wl) in enumerate(shapes):
        if l > 0:
            level = jax.image.resize(level, (hl, wl), "linear")
        blurred = _blur(level, kernel)
        # Adaptive FAST threshold (reference ORB per-cell retry at the min
        # threshold): score at hi + lo thresholds in one shared pass; rank
        # hi corners above lo ones so lo corners only fill weak cells.
        raw_hi, raw_lo = _fast_scores(
            level, (float(orb.fast_threshold), float(orb.fast_threshold_min))
        )
        border = jnp.asarray(_border_mask(hl, wl, _LEVEL_BORDER))
        nms_hi = _nms3(raw_hi) * border
        nms_lo = _nms3(raw_lo) * border
        rank = jnp.where(nms_hi > 0, nms_hi + _BOOST_HI, nms_lo)
        raw_score = jnp.where(raw_hi > 0, raw_hi, raw_lo)
        k = budgets[l]
        ys, xs, top = _grid_select(rank, k, orb.grid_rows, orb.grid_cols)
        valid = top > 0
        angle, desc = _orientation_and_desc(blurred, ys, xs, pattern)
        # Sub-pixel refinement: 1D quadratic fit on the raw FAST score along
        # each axis (integer detection adds +-0.5 px noise that dominates
        # pose accuracy on clean data).
        dxs, dys = _subpixel_offsets(raw_score, ys, xs)
        xf = xs.astype(jnp.float32) + dxs
        yf = ys.astype(jnp.float32) + dys
        # Level-l -> level-0 coords under jax.image.resize's pixel-center
        # alignment: x0 = (x_l + 0.5) * (W0 / W_l) - 0.5 (the actual per-level
        # scale, not the nominal 1.2^l — the nominal form introduces a
        # systematic +0.5*(s-1) px bias that tilts pose optimization).
        sx, sy = w / wl, h / hl
        uv = jnp.stack(
            [(xf + 0.5) * sx - 0.5, (yf + 0.5) * sy - 0.5],
            -1,
        )
        uv_all.append(uv)
        ang_all.append(angle)
        desc_all.append(desc)
        oct_all.append(jnp.full((k,), l, jnp.int32))
        # Response = raw FAST margin (boost-free), comparable across cells.
        resp_all.append(raw_score[jnp.clip(ys, 0, hl - 1), jnp.clip(xs, 0, wl - 1)])
        val_all.append(valid)

    uv = jnp.concatenate(uv_all)
    valid = jnp.concatenate(val_all)
    # Depth lookup at level-0 coords (nearest retained sample; the depth
    # map may arrive subsampled by cam.depth_wire_stride, see config).
    s = cam.depth_wire_stride
    hs, ws = cam.depth_wire_shape
    ui = jnp.clip(jnp.round(uv[:, 0] / s).astype(jnp.int32), 0, ws - 1)
    vi = jnp.clip(jnp.round(uv[:, 1] / s).astype(jnp.int32), 0, hs - 1)
    z = depth[vi, ui]
    has_depth = valid & cam_mod.valid_depth(cam, z)
    z = jnp.where(has_depth, z, 0.0)
    xyz = cam_mod.backproject(cam, uv, z)
    return FrameFeatures(
        uv=uv,
        xyz=jnp.where(has_depth[:, None], xyz, 0.0),
        depth=z,
        desc=jnp.concatenate(desc_all),
        angle=jnp.concatenate(ang_all),
        octave=jnp.concatenate(oct_all),
        response=jnp.concatenate(resp_all),
        valid=valid,
        has_depth=has_depth,
    )


def rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    """Host-side u8 RGB -> f32 gray in [0, 255] (ITU-R BT.601, cv2-compatible)."""
    rgb = rgb.astype(np.float32)
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
