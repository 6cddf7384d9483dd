"""Geometry property tests (SURVEY.md §4.2.3): exp∘log = id, group laws,
quaternion/matrix round-trips, agreement with scipy-free numpy references."""

import numpy as np
import jax
import jax.numpy as jnp

from boslam_tpu.geometry import se3


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.where(q[:, :1] < 0, -1.0, 1.0)
    return q


def random_poses(rng, n):
    return np.concatenate([random_quats(rng, n), rng.normal(size=(n, 3))], axis=-1)


def test_quat_mat_roundtrip(rng):
    q = random_quats(rng, 64)
    m = se3.quat_to_mat(q)
    # Orthonormality
    eye = np.broadcast_to(np.eye(3), m.shape)
    np.testing.assert_allclose(np.asarray(m @ np.swapaxes(m, -1, -2)), eye, atol=1e-5)
    q2 = se3.mat_to_quat(m)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 32)
    v = rng.normal(size=(32, 3))
    r1 = se3.quat_rotate(q, v)
    r2 = np.einsum("nij,nj->ni", np.asarray(se3.quat_to_mat(q)), v)
    np.testing.assert_allclose(np.asarray(r1), r2, atol=1e-5)


def test_exp_log_roundtrip(rng):
    xi = rng.normal(size=(128, 6))
    xi[:64] *= 0.01  # small-angle branch
    # log returns the wrapped-equivalent rotation, so keep |omega| < pi.
    norms = np.linalg.norm(xi[:, :3], axis=-1, keepdims=True)
    xi[:, :3] *= np.minimum(1.0, 0.9 * np.pi / np.maximum(norms, 1e-9))
    xi2 = se3.log(se3.exp(jnp.asarray(xi)))
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-4)


def test_log_exp_roundtrip(rng):
    p = random_poses(rng, 64)
    p2 = se3.exp(se3.log(jnp.asarray(p)))
    np.testing.assert_allclose(np.asarray(p2), p, atol=1e-4)


def test_compose_inverse(rng):
    a = jnp.asarray(random_poses(rng, 32))
    b = jnp.asarray(random_poses(rng, 32))
    x = jnp.asarray(rng.normal(size=(32, 3)))
    # (a ∘ b)(x) == a(b(x))
    np.testing.assert_allclose(
        np.asarray(se3.pose_apply(se3.pose_compose(a, b), x)),
        np.asarray(se3.pose_apply(a, se3.pose_apply(b, x))),
        atol=1e-4,
    )
    # a ∘ a^-1 == id
    ident = se3.pose_compose(a, se3.pose_inv(a))
    rot_err, t_err = se3.pose_distance(ident, se3.pose_identity((32,)))
    assert float(jnp.max(rot_err)) < 1e-4
    assert float(jnp.max(t_err)) < 1e-4


def test_pose_matrix_roundtrip(rng):
    p = jnp.asarray(random_poses(rng, 32))
    m = se3.pose_to_mat(p)
    p2 = se3.mat_to_pose(m)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-5)
    x = jnp.asarray(rng.normal(size=(32, 3)))
    xh = jnp.concatenate([x, jnp.ones((32, 1))], axis=-1)
    np.testing.assert_allclose(
        np.asarray(se3.pose_apply(p, x)),
        np.asarray(jnp.einsum("nij,nj->ni", m, xh)[..., :3]),
        atol=1e-5,
    )


def test_exp_is_differentiable():
    def f(xi):
        return jnp.sum(se3.pose_apply(se3.exp(xi), jnp.ones(3)))

    g = jax.grad(f)(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(f)(jnp.array([0.3, -0.2, 0.1, 1.0, 2.0, -1.0]))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_retract_zero_is_identity(rng):
    p = jnp.asarray(random_poses(rng, 8))
    p2 = se3.retract(p, jnp.zeros((8, 6)))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-6)
