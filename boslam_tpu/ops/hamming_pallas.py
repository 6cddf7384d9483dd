"""Fused projection-window Hamming matcher as a Pallas TPU kernel.

Replaces the materialized [N, M] pipeline of ``matching.projection`` (d2
matrix + window mask + Hamming matrix + two argmin passes, ~5 NxM f32
intermediates in HBM) with one streaming kernel: the map side is tiled over
M, each tile's Hamming distances come off one MXU matmul
(popcount(a^b) = |a| + |b| - 2 a.b on unpacked {0,1} bits), the projection
window is applied in VMEM, and a running row-wise (best, second, argbest)
plus per-tile column argmin (for the mutual check) are reduced across grid
steps in scratch.  HBM traffic drops from O(N*M) to O(N + M) per pass.

Reference behavior being replaced: cv2.BFMatcher(NORM_HAMMING) +
search_by_projection (SURVEY.md §2.2 "OpenCV BFMatcher", §2.1 "Matcher").

Measured on TPU v5 lite at N=512, M=16384: 1.10 ms/call vs 0.77 ms for the
XLA-fused jnp pipeline — XLA's own fusion of the materialized path is already
MXU/HBM-efficient at these shapes, so the jnp path stays the default; this
kernel wins only when M grows far beyond the v5e HBM budget for O(N*M)
intermediates (e.g. multi-map or >100k-point matching).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from boslam_tpu.matching import hamming

_BIG = 1e9  # plain float: jnp scalars captured in a pallas kernel are rejected


def _kernel(bits_a_ref, na_ref, ua_ref, va_ref, r2_ref, valid_a_ref,
            bits_b_ref, nb_ref, ub_ref, vb_ref, vis_b_ref,
            best_ref, second_ref, bidx_ref, colarg_ref,
            run_best, run_second, run_bidx):
    """Grid dim 0 tiles the map (B) axis; row state carried in scratch."""
    t = pl.program_id(0)
    mt = bits_b_ref.shape[0]

    # --- tile Hamming distances on the MXU ------------------------------
    dot = jax.lax.dot_general(
        bits_a_ref[:], bits_b_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, MT]
    dist = na_ref[:] + nb_ref[:].reshape(1, mt) - 2.0 * dot

    # --- projection window ---------------------------------------------
    dx = ua_ref[:] - ub_ref[:].reshape(1, mt)
    dy = va_ref[:] - vb_ref[:].reshape(1, mt)
    d2 = dx * dx + dy * dy
    admissible = (d2 <= r2_ref[:]) & (vis_b_ref[:].reshape(1, mt) > 0)
    masked = jnp.where(admissible, dist, _BIG)

    # --- per-tile column argmin (mutual check), rows gated by valid_a ---
    col_masked = jnp.where(valid_a_ref[:] > 0, masked, _BIG)
    colarg_ref[:] = jnp.argmin(col_masked, axis=0, keepdims=True).astype(
        jnp.int32
    )

    # --- row-wise top-2 within the tile ---------------------------------
    m1 = jnp.min(masked, axis=1, keepdims=True)                     # [N,1]
    a1 = jnp.argmin(masked, axis=1, keepdims=True).astype(jnp.int32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, masked.shape, 1)
    m2 = jnp.min(jnp.where(col_ids == a1, _BIG, masked), axis=1,
                 keepdims=True)                                     # [N,1]
    a1_global = a1 + t * mt

    # --- merge with the running (best, second, argbest) -----------------
    @pl.when(t == 0)
    def _():
        run_best[:] = jnp.full_like(run_best, _BIG)
        run_second[:] = jnp.full_like(run_second, _BIG)
        run_bidx[:] = jnp.full_like(run_bidx, -1)

    old_b, old_s, old_i = run_best[:], run_second[:], run_bidx[:]
    new_best = jnp.minimum(old_b, m1)
    new_bidx = jnp.where(m1 < old_b, a1_global, old_i)
    new_second = jnp.minimum(jnp.maximum(old_b, m1), jnp.minimum(old_s, m2))
    run_best[:] = new_best
    run_second[:] = new_second
    run_bidx[:] = new_bidx

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        best_ref[:] = new_best
        second_ref[:] = new_second
        bidx_ref[:] = new_bidx


def _fused_match_pallas(bits_a, na, uv_a, r2_a, valid_a,
                        bits_b, nb, uv_b, vis_b, m_tile, interpret=False):
    n = bits_a.shape[0]
    m = bits_b.shape[0]
    grid = m // m_tile
    col = lambda x: x.reshape(n, 1).astype(jnp.float32)
    kernel = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n, 256), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, 256), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile,), lambda t: (t,), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile,), lambda t: (t,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )
    best, second, bidx, colarg = kernel(
        bits_a, col(na), col(uv_a[:, 0]), col(uv_a[:, 1]), col(r2_a),
        col(valid_a),
        bits_b, nb.astype(jnp.float32), uv_b[:, 0], uv_b[:, 1],
        vis_b.astype(jnp.float32),
    )
    return best[:, 0], second[:, 0], bidx[:, 0], colarg[0]


def fused_match_top2(
    desc_a, uv_a, r_a, valid_a,
    desc_b, uv_b, vis_b,
    max_dist: int, ratio: float = 1.0, mutual: bool = True,
    m_tile: int = 1024, interpret: bool | None = None,
):
    """Projection-window Hamming match: streaming Pallas kernel + epilogue.

    Args:
      desc_a: [N, 8] u32 frame descriptors; uv_a [N, 2] keypoint pixels;
        r_a [N] per-keypoint window radius (pixels; jnp.inf = no window);
        valid_a [N] bool.
      desc_b: [M, 8] u32 map descriptors; uv_b [M, 2] projected pixels;
        vis_b [M] bool (visibility x validity).
      max_dist / ratio / mutual: same contract as ``hamming.match_top2``.

    Returns (match_idx [N] i32 into B or -1, match_mask [N] bool,
    match_dist [N] i32) — identical semantics to the jnp path.
    """
    n, m = desc_a.shape[0], desc_b.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = not on_tpu
    if m % m_tile != 0 or not (on_tpu or interpret):
        # jnp fallback (CPU test suite / odd capacities).
        dist = hamming.hamming_matrix_mxu(desc_a, desc_b)
        d2 = jnp.sum((uv_a[:, None, :] - uv_b[None, :, :]) ** 2, axis=-1)
        window = d2 <= (r_a[:, None] ** 2)
        return hamming.match_top2(
            dist, valid_a, vis_b, max_dist=max_dist, ratio=ratio,
            mutual=mutual, extra_mask=window,
        )

    bits_a = hamming.unpack_bits(desc_a).astype(jnp.bfloat16)
    bits_b = hamming.unpack_bits(desc_b).astype(jnp.bfloat16)
    na = jnp.sum(hamming.popcount_u32(desc_a), axis=-1).astype(jnp.float32)
    nb = jnp.sum(hamming.popcount_u32(desc_b), axis=-1).astype(jnp.float32)
    r2 = jnp.minimum(r_a.astype(jnp.float32) ** 2, _BIG)

    best, second, bidx, colarg = _fused_match_pallas(
        bits_a, na, uv_a.astype(jnp.float32), r2,
        valid_a.astype(jnp.float32), bits_b, nb,
        uv_b.astype(jnp.float32), vis_b, m_tile, interpret=interpret,
    )

    # Epilogue on [N]/[M] vectors — same tests as hamming.match_top2.
    matched = bidx >= 0
    safe_idx = jnp.clip(bidx, 0, m - 1)
    ok = valid_a & matched & (best <= max_dist) & (best <= ratio * second)
    if mutual:
        ok = ok & (colarg[safe_idx] == jnp.arange(n, dtype=jnp.int32))
    idx = jnp.where(ok, bidx, -1)
    return idx.astype(jnp.int32), ok, best.astype(jnp.int32)
