"""Pinhole RGBD camera model (reference camera.py, SURVEY.md §2.1).

Backprojection follows the reference contract
``X = D(u, v) / depth_factor * K^{-1} [u, v, 1]`` — here depth arrays are
already in metres by the time they reach these functions (the IO layer divides
by ``depth_factor``).
"""

from __future__ import annotations

import jax.numpy as jnp

from boslam_tpu.config import CameraConfig


def intrinsics(cam: CameraConfig):
    return jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]]
    )


def project(cam: CameraConfig, xc):
    """Camera-frame points [..., 3] -> pixel coords [..., 2] (u, v).

    No validity clamp here; callers mask on z > 0 and image bounds.
    """
    z = xc[..., 2:3]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * xc[..., 0:1] / zs + cam.cx
    v = cam.fy * xc[..., 1:2] / zs + cam.cy
    return jnp.concatenate([u, v], axis=-1)


def backproject(cam: CameraConfig, uv, z):
    """Pixels [..., 2] + depth [..., 1]or[...] -> camera-frame points [..., 3]."""
    z = jnp.asarray(z)
    if z.shape != uv.shape[:-1]:
        z = z[..., 0]
    x = (uv[..., 0] - cam.cx) / cam.fx * z
    y = (uv[..., 1] - cam.cy) / cam.fy * z
    return jnp.stack([x, y, z], axis=-1)


def in_image(cam: CameraConfig, uv, border: float = 0.0):
    return (
        (uv[..., 0] >= border)
        & (uv[..., 0] < cam.width - border)
        & (uv[..., 1] >= border)
        & (uv[..., 1] < cam.height - border)
    )


def valid_depth(cam: CameraConfig, z):
    return (z > cam.depth_min) & (z < cam.depth_max)


def project_jacobian(cam: CameraConfig, xc):
    """d(u,v)/d(xc): [..., 2, 3] for camera-frame points."""
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / zs
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)
