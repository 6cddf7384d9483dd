"""Pallas TPU kernels for the feature frontend (SURVEY.md §7.1 step 8,
BASELINE.json "batched Pallas kernels" mandate).

Two kernels replace the frontend's hot spots:

1. ``fast_rank_pallas`` — FAST-9 corner score (hi + lo threshold) + 3x3 NMS +
   rank fusion in ONE row-tiled kernel.  The jnp path materializes a
   [16, H, W] shifted stack per threshold (jnp.roll + where/sum reductions,
   ~60 MB of HBM round-trips per frame); here the 16 circle offsets are
   static slices of a VMEM-resident padded image accumulated into four
   margin maps and four uint32 contiguity bitmasks, so HBM traffic is one
   image read + two map writes per level.

2. ``extract_patches_pallas`` — gathers a 32x32 patch around each keypoint
   from the VMEM-resident blurred level image (scalar-prefetched coords),
   replacing the vmapped ``jax.lax.dynamic_slice`` gather that XLA lowers
   poorly (VERDICT r2 item 1: ``features/frontend.py`` dynamic-slice vmaps).

Both have jnp golden twins in ``features/frontend.py`` (same accumulate
formulation — asserted equal in tests/test_ops_pallas.py); the frontend
gates on backend like ops/hamming_pallas.py.

The FAST-9 contiguity test uses the classic bitmask trick: build a 16-bit
mask of per-offset bright/dark flags, duplicate it into the high half-word
(circular wrap), and AND together 9 consecutive shifts — a corner iff any
surviving bit.  The score is the summed intensity margin of the triggering
polarity: since ``bright_k ⟺ relu(d_k - t) > 0``, the masked sum equals an
accumulated ReLU (exactly the jnp reference's ``where(bright, d - t, 0)``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# FAST radius-3 Bresenham circle (dx, dy) — must match frontend._CIRCLE.
_CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)

_PAD = 4        # circle radius 3 + 1 row/col of NMS halo
# Row tile: the 16-offset unrolled loop keeps several [tile+2, W+2] f32
# temporaries live; 16 rows keeps the Mosaic stack well under the 16 MB
# VMEM scope at W=640 (64 rows overflowed it).
_TILE_H = 16


def _contig9(mask):
    """uint32 [..] per-pixel circle bitmask (bits 0..15) -> nonzero iff >= 9
    contiguous (circular) bits are set."""
    dup = mask | (mask << 16)
    acc = dup
    for s in range(1, 9):
        acc = acc & (dup >> s)
    return (acc & jnp.uint32(0xFFFF)) != 0


def _fast_kernel(img_ref, rank_ref, raw_ref, *, t_hi, t_lo, h, w,
                 boost_hi, border):
    i = pl.program_id(0)
    r0 = pl.multiple_of(i * _TILE_H, _TILE_H)
    th = _TILE_H + 2  # compute rows: 1 halo row each side for NMS
    w2 = w + 2        # compute lanes: 1 halo lane each side for NMS

    # Padded-image coordinates: image pixel (y, x) lives at (y+4, x+4);
    # compute region starts at image row r0-1 / col -1 -> padded (r0+3, 3).
    # Mosaic requires dynamic sublane offsets to be provably 8-aligned, so
    # load one aligned slab (r0 is a multiple of _TILE_H) and take the 16
    # circle shifts as STATIC slices of the loaded value.
    slab = img_ref[pl.ds(r0, _TILE_H + 2 * _PAD), :]
    center = jax.lax.slice(slab, (3, 3), (3 + th, 3 + w2))
    zf = jnp.zeros((th, w2), jnp.float32)
    zu = jnp.zeros((th, w2), jnp.uint32)
    mb_hi, md_hi, mb_lo, md_lo = zf, zf, zf, zf
    kb_hi, kd_hi, kb_lo, kd_lo = zu, zu, zu, zu
    for k, (dx, dy) in enumerate(_CIRCLE):
        d = jax.lax.slice(
            slab, (3 + dy, 3 + dx), (3 + dy + th, 3 + dx + w2)
        ) - center
        bit = jnp.uint32(1 << k)
        mb_hi += jnp.maximum(d - t_hi, 0.0)
        md_hi += jnp.maximum(-d - t_hi, 0.0)
        mb_lo += jnp.maximum(d - t_lo, 0.0)
        md_lo += jnp.maximum(-d - t_lo, 0.0)
        kb_hi |= jnp.where(d > t_hi, bit, 0)
        kd_hi |= jnp.where(-d > t_hi, bit, 0)
        kb_lo |= jnp.where(d > t_lo, bit, 0)
        kd_lo |= jnp.where(-d > t_lo, bit, 0)

    score_hi = jnp.maximum(
        jnp.where(_contig9(kb_hi), mb_hi, 0.0),
        jnp.where(_contig9(kd_hi), md_hi, 0.0),
    )
    score_lo = jnp.maximum(
        jnp.where(_contig9(kb_lo), mb_lo, 0.0),
        jnp.where(_contig9(kd_lo), md_lo, 0.0),
    )

    def nms(score):
        mx = score[0:_TILE_H, 0:w]
        for ddy in range(3):
            for ddx in range(3):
                mx = jnp.maximum(mx, score[ddy:ddy + _TILE_H, ddx:ddx + w])
        inner = score[1:1 + _TILE_H, 1:1 + w]
        return jnp.where((inner >= mx) & (inner > 0.0), inner, 0.0)

    nms_hi = nms(score_hi)
    nms_lo = nms(score_lo)
    # Border mask (level border: descriptor patch + circle stay inside).
    rows = jax.lax.broadcasted_iota(jnp.int32, (_TILE_H, w), 0) + r0
    cols = jax.lax.broadcasted_iota(jnp.int32, (_TILE_H, w), 1)
    inb = (
        (rows >= border) & (rows < h - border)
        & (cols >= border) & (cols < w - border)
    )
    rank = jnp.where(nms_hi > 0, nms_hi + boost_hi, nms_lo)
    rank_ref[:] = jnp.where(inb, rank, 0.0)
    raw_hi = score_hi[1:1 + _TILE_H, 1:1 + w]
    raw_lo = score_lo[1:1 + _TILE_H, 1:1 + w]
    raw_ref[:] = jnp.where(raw_hi > 0, raw_hi, raw_lo)


@functools.partial(
    jax.jit, static_argnames=("t_hi", "t_lo", "boost_hi", "border", "interpret")
)
def fast_rank_pallas(level, t_hi: float, t_lo: float, boost_hi: float,
                     border: int, interpret: bool = False):
    """FAST-9 hi/lo score + NMS + rank fusion for one pyramid level.

    Returns (rank [H, W], raw [H, W]) with identical semantics to the jnp
    reference (frontend._fast_rank_maps): ``rank`` is the NMS'd,
    border-masked ranking map with hi-threshold corners boosted by
    ``boost_hi``; ``raw`` is the pre-NMS score map (hi where present, else
    lo) used for sub-pixel refinement and response lookup.
    """
    h, w = level.shape
    hp = -(-h // _TILE_H) * _TILE_H
    img_p = jnp.zeros((hp + 2 * _PAD, w + 2 * _PAD), jnp.float32)
    img_p = jax.lax.dynamic_update_slice(img_p, level, (_PAD, _PAD))
    kern = functools.partial(
        _fast_kernel, t_hi=float(t_hi), t_lo=float(t_lo), h=h, w=w,
        boost_hi=float(boost_hi), border=int(border),
    )
    rank, raw = pl.pallas_call(
        kern,
        grid=(hp // _TILE_H,),
        in_specs=[
            pl.BlockSpec(
                (hp + 2 * _PAD, w + 2 * _PAD), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_H, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_H, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp, w), jnp.float32),
            jax.ShapeDtypeStruct((hp, w), jnp.float32),
        ],
        interpret=interpret,
    )(img_p)
    return rank[:h], raw[:h]


def _patch_kernel(coords_ref, img_ref, out_ref, *, half):
    k = pl.program_id(0)
    y = coords_ref[k, 0]
    x = coords_ref[k, 1]
    p = 2 * half + 2
    # Sublane-aligned ref load (Mosaic requires dynamic sublane offsets to
    # be provably 8-aligned), then dynamic circular rolls for the residual
    # row offset and the lane offset — value-level dynamic_slice has no
    # Pallas TPU lowering, but tpu.DynamicRotate does.
    top = y - half
    y0 = pl.multiple_of((top // 8) * 8, 8)
    rows = p + 8
    slab = img_ref[pl.ds(y0, rows), :]
    w = slab.shape[1]
    # roll(x, s)[i] = x[i - s]; shift by (size - offset) reads x[i + offset].
    r1 = pltpu.roll(slab, rows - (top - y0), axis=0)
    r2 = pltpu.roll(r1, w - (x - half), axis=1)
    out_ref[0] = r2[:p, :p]


@functools.partial(jax.jit, static_argnames=("half", "interpret"))
def extract_patches_pallas(img, ys, xs, half: int = 15,
                           interpret: bool = False):
    """[K, 2*half+2, 2*half+2] patches centred at (ys, xs) from a
    VMEM-resident image (coords scalar-prefetched; equivalent to the
    frontend's vmapped ``jax.lax.dynamic_slice``)."""
    k = ys.shape[0]
    p = 2 * half + 2
    h, w = img.shape
    coords = jnp.stack(
        [jnp.clip(ys, half, h - half - 2), jnp.clip(xs, half, w - half - 2)],
        axis=-1,
    ).astype(jnp.int32)
    # Row-pad so the 8-aligned slab load never runs past the image; lane-pad
    # to a multiple of 128 (tpu.dynamic_rotate rejects unaligned lane dims).
    hp = -(-h // 8) * 8 + 8
    wp = -(-w // 128) * 128
    img = jnp.zeros((hp, wp), jnp.float32).at[:h, :w].set(img)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((hp, wp), lambda i, coords: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, p), lambda i, coords: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_patch_kernel, half=half),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, p, p), jnp.float32),
        interpret=interpret,
    )(coords, img)
