"""Camera projection round-trips + Umeyama/ATE property tests (SURVEY.md §4.2.3)."""

import numpy as np
import jax.numpy as jnp

from boslam_tpu.config import CameraConfig
from boslam_tpu.geometry import align, camera, se3


CAM = CameraConfig()


def test_project_backproject_roundtrip(rng):
    uv = np.stack(
        [rng.uniform(0, CAM.width, 256), rng.uniform(0, CAM.height, 256)], axis=-1
    )
    z = rng.uniform(0.5, 5.0, 256)
    xc = camera.backproject(CAM, jnp.asarray(uv), jnp.asarray(z))
    uv2 = camera.project(CAM, xc)
    np.testing.assert_allclose(np.asarray(uv2), uv, atol=1e-3)
    np.testing.assert_allclose(np.asarray(xc[..., 2]), z, atol=1e-6)


def test_project_jacobian_matches_fd(rng):
    xc = rng.uniform(size=(16, 3)) + np.array([0, 0, 1.0])
    J = np.asarray(camera.project_jacobian(CAM, jnp.asarray(xc)))
    eps = 1e-3
    for k in range(3):
        d = np.zeros(3)
        d[k] = eps
        fd = (
            np.asarray(camera.project(CAM, jnp.asarray(xc + d)))
            - np.asarray(camera.project(CAM, jnp.asarray(xc - d)))
        ) / (2 * eps)
        # f32 FD at pixel scale ~500 -> loose absolute tolerance.
        np.testing.assert_allclose(J[:, :, k], fd, atol=0.5, rtol=1e-2)


def test_umeyama_recovers_transform(rng):
    src = rng.normal(size=(64, 3))
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    dst = np.asarray(se3.quat_rotate(jnp.asarray(q)[None], jnp.asarray(src))) + t
    s, q_est, t_est = align.umeyama(jnp.asarray(src), jnp.asarray(dst))
    dst2 = np.asarray(se3.quat_rotate(q_est[None], jnp.asarray(src))) + np.asarray(t_est)
    np.testing.assert_allclose(dst2, dst, atol=5e-3)  # f32 SVD accuracy
    assert abs(float(s) - 1.0) < 1e-4


def test_umeyama_with_scale(rng):
    src = rng.normal(size=(64, 3))
    dst = 2.5 * src + np.array([1.0, -2.0, 0.5])
    s, q, t = align.umeyama(jnp.asarray(src), jnp.asarray(dst), with_scale=True)
    assert abs(float(s) - 2.5) < 2e-3


def test_ate_zero_on_perfect_trajectory(rng):
    traj = np.cumsum(rng.normal(size=(100, 3)) * 0.1, axis=0)
    # Rigidly transformed copy must align to zero error.
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    est = np.asarray(se3.quat_rotate(jnp.asarray(q)[None], jnp.asarray(traj))) + 5.0
    rmse, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(traj))
    assert float(rmse) < 5e-3  # f32 SVD accuracy at |t| ~ 5


def test_ate_with_mask(rng):
    traj = np.cumsum(rng.normal(size=(50, 3)) * 0.1, axis=0)
    est = traj.copy()
    est[10] += 100.0  # huge outlier, masked out
    w = np.ones(50)
    w[10] = 0.0
    rmse, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(traj), jnp.asarray(w))
    assert float(rmse) < 5e-3


def test_rpe_identity(rng):
    n = 30
    poses = []
    p = se3.pose_identity()
    for i in range(n):
        p = se3.pose_compose(p, se3.exp(jnp.asarray(rng.normal(size=6) * 0.1)))
        poses.append(p)
    poses = jnp.stack(poses)
    dt, dr = align.rpe(poses, poses)
    assert float(dt) < 1e-5 and float(dr) < 1e-5
