"""Robust-cost machinery shared by all solvers (Huber kernel, chi2 gating).

Replaces g2o's ``RobustKernelHuber`` + the reference's 4x10 LM rounds with
chi-square inlier reclassification (SURVEY.md §2.1 "Optimization wrappers").
"""

from __future__ import annotations

import jax.numpy as jnp


def huber_weight(chi2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel as a function of squared error.

    rho'(e)/e with e = sqrt(chi2): 1 inside the delta bound, delta/e outside.
    """
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(e <= delta, 1.0, delta / e)


def huber_cost(chi2: jnp.ndarray, delta: float) -> jnp.ndarray:
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(e <= delta, 0.5 * chi2, delta * (e - 0.5 * delta))


def octave_inv_sigma2(octave: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """Per-octave information weight 1/sigma^2, sigma = scale^octave
    (ORB-SLAM-style pyramid noise model; g2o edge information matrices)."""
    return scale_factor ** (-2.0 * octave.astype(jnp.float32))
