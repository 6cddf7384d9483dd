"""Per-substage timing of the feature frontend on production shapes.

Each substage runs under lax.scan (chained iterations, one dispatch) so
remote-tunnel dispatch latency doesn't pollute the numbers; reported ms is
device time per iteration.  Used to target the Pallas kernel work
(VERDICT r2 item 1).
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from boslam_tpu.config import OrbConfig, SlamConfig
from boslam_tpu.features import frontend as fe
from boslam_tpu.io import synthetic

REPS = 20


def timed(name, fn, *args):
    """fn must be jittable: (*args) -> array or tuple; reports ms/iter.

    Timing over a remote-TPU tunnel is a minefield (all three bit this
    repo in r3, each producing fantasy sub-0.1ms numbers):
    * FULL sums of every output leaf must feed the scan carry — summing a
      slice (``leaves[..., :1]``) lets XLA DCE most of the body.
    * A fresh ``salt`` input per call — identical repeated dispatches can
      complete without re-executing.
    * ``block_until_ready`` does not reliably include the ~25 ms tunnel
      round trip, and a value read always does.  So: sync via a VALUE
      READ, measure scans of length N and 2N, and report the DIFFERENCE
      per iteration — constant overhead (RTT, dispatch) cancels.
    """

    def make(length):
        def loop(args0, salt):
            def body(c, _):
                args, acc = c
                # Data-dependent input perturbation: defeats hoisting the
                # loop-invariant body out of the scan.
                eps = acc * 1e-30 + salt * 1e-30
                pargs = tuple(
                    a + eps if jnp.issubdtype(a.dtype, jnp.floating) else a
                    for a in args
                )
                out = fn(*pargs)
                leaves = jax.tree_util.tree_leaves(out)
                acc = acc + sum(
                    jnp.sum(l.astype(jnp.float32)) for l in leaves
                )
                return (args, acc), None

            (_, acc), _ = jax.lax.scan(body, (args0, 0.0), None,
                                       length=length)
            return acc

        return jax.jit(loop)

    walls = {}
    for length, jl in ((REPS, make(REPS)), (2 * REPS, make(2 * REPS))):
        float(jl(args, np.float32(0)))  # compile + settle
        out = []
        for i in range(5):
            salt = np.float32(length * 131 + i + 1)
            t0 = time.perf_counter()
            float(jl(args, salt))  # value read = real sync
            out.append((time.perf_counter() - t0) * 1e3)
        walls[length] = float(np.median(out))
    ms = (walls[2 * REPS] - walls[REPS]) / REPS
    print(f"  {name:34s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    cfg = SlamConfig()
    cam = cfg.camera
    orb = cfg.orb
    rgb, depth = synthetic.render_frame(cam, np.array([1.0, 0, 0, 0, 0, 0, 0]))
    gray = jnp.asarray(fe.rgb_to_gray(rgb))
    depth = jnp.asarray(depth)
    print(f"device: {jax.devices()[0]}", flush=True)
    on_tpu = jax.default_backend() == "tpu"
    shapes = fe.pyramid_shapes(cam.height, cam.width, orb.n_levels, orb.scale_factor)
    budgets = fe.distribute_features(orb.n_features, orb.n_levels, orb.scale_factor)
    kernel = jnp.asarray(fe._gauss7())
    t_hi, t_lo = float(orb.fast_threshold), float(orb.fast_threshold_min)

    cfg_j = cfg.replace(orb=OrbConfig(frontend_impl="jnp"))
    timed("extract_features impl=jnp", lambda g, d: fe.extract_features(g, d, cfg_j), gray, depth)
    if on_tpu:
        cfg_p = cfg.replace(orb=OrbConfig(frontend_impl="pallas"))
        timed("extract_features impl=pallas", lambda g, d: fe.extract_features(g, d, cfg_p), gray, depth)
        cfg_a = cfg.replace(orb=OrbConfig(frontend_impl="auto"))
        timed("extract_features impl=auto", lambda g, d: fe.extract_features(g, d, cfg_a), gray, depth)

    level_imgs = []
    level = gray
    for l, (hl, wl) in enumerate(shapes):
        if l > 0:
            level = jax.image.resize(level, (hl, wl), "linear")
        level_imgs.append(level)

    def pyr(g):
        level = g
        outs = []
        for l, (hl, wl) in enumerate(shapes):
            if l > 0:
                level = jax.image.resize(level, (hl, wl), "linear")
            outs.append(level)
        return tuple(outs)

    timed("pyramid resize chain", pyr, gray)
    timed("blur x8", lambda *ims: tuple(fe._blur(im, kernel) for im in ims), *level_imgs)

    timed(
        "fast_rank jnp x8",
        lambda *ims: tuple(fe._fast_rank_maps(im, t_hi, t_lo, 17) for im in ims),
        *level_imgs,
    )
    if on_tpu:
        from boslam_tpu.ops.frontend_pallas import fast_rank_pallas

        timed(
            "fast_rank pallas x8",
            lambda *ims: tuple(
                fast_rank_pallas(im, t_hi, t_lo, fe._BOOST_HI, 17) for im in ims
            ),
            *level_imgs,
        )

    def grid_all(*ims):
        return tuple(
            fe._grid_select(im, budgets[l], orb.grid_rows, orb.grid_cols)
            for l, im in enumerate(ims)
        )

    timed("grid_select x8", grid_all, *level_imgs)

    def mk_coords(l):
        k = budgets[l]
        hl, wl = shapes[l]
        rng = np.random.default_rng(l)
        ys = jnp.asarray(rng.integers(17, hl - 17, size=k), jnp.int32)
        xs = jnp.asarray(rng.integers(17, wl - 17, size=k), jnp.int32)
        return ys, xs

    coords = [mk_coords(l) for l in range(orb.n_levels)]

    def patches_jnp(*ims):
        return tuple(
            fe._extract_patches_jnp(im, *coords[l]) for l, im in enumerate(ims)
        )

    timed("patches jnp x8", patches_jnp, *level_imgs)
    if on_tpu:
        from boslam_tpu.ops.frontend_pallas import extract_patches_pallas

        def patches_pl(*ims):
            return tuple(
                extract_patches_pallas(im, *coords[l]) for l, im in enumerate(ims)
            )

        timed("patches pallas x8", patches_pl, *level_imgs)

    all_patches = jnp.concatenate(
        [fe._extract_patches_jnp(level_imgs[l], *coords[l]) for l in range(orb.n_levels)]
    )
    timed("orient_and_brief (512 kp)", fe.orient_and_brief, all_patches)

    def subpix_all(*ims):
        return tuple(
            fe._subpixel_offsets(im, *coords[l]) for l, im in enumerate(ims)
        )

    timed("subpixel x8", subpix_all, *level_imgs)


if __name__ == "__main__":
    main()
