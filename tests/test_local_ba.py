"""Local BA tests: Schur solve vs dense normal equations (SURVEY.md §4.2.2),
LM convergence on a synthetic window, and end-to-end map refinement."""

import numpy as np
import jax
import jax.numpy as jnp

from boslam_tpu.config import CameraConfig, LocalBaConfig, OrbConfig, SlamConfig
from boslam_tpu.geometry import camera as cam_mod
from boslam_tpu.geometry import se3
from boslam_tpu.solvers import ba_core
from boslam_tpu.solvers.ba_core import BaEdges
from boslam_tpu.solvers.local_ba import DenseEdges, _lm_solve_step


def to_dense(edges: BaEdges, n_cams: int, L: int) -> DenseEdges:
    """Repack a sparse edge list into the solver's dense [C, L] grid."""
    uv = np.zeros((n_cams, L, 2), np.float32)
    depth = np.zeros((n_cams, L), np.float32)
    has_d = np.zeros((n_cams, L), bool)
    info = np.zeros((n_cams, L), np.float32)
    valid = np.zeros((n_cams, L), bool)
    cam = np.asarray(edges.cam); pt = np.asarray(edges.pt)
    for e in range(cam.shape[0]):
        if not bool(edges.valid[e]):
            continue
        c, p = int(cam[e]), int(pt[e])
        uv[c, p] = np.asarray(edges.uv[e])
        depth[c, p] = float(edges.depth[e])
        has_d[c, p] = bool(edges.has_depth[e])
        info[c, p] = float(edges.info[e])
        valid[c, p] = True
    return DenseEdges(
        uv=jnp.asarray(uv), depth=jnp.asarray(depth),
        has_depth=jnp.asarray(has_d), info=jnp.asarray(info),
        valid=jnp.asarray(valid),
    )

CAM = CameraConfig(width=320, height=240, fx=130.0, fy=130.0, cx=160.0, cy=120.0)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=128, n_levels=4),
    local_ba=LocalBaConfig(n_opt_kf=2, n_fixed_kf=2, max_local_points=64, lm_iters=12),
)


def make_ba_problem(rng, n_pts=50, noise_uv=0.0):
    """4 cameras (2 opt, 2 fixed) observing n_pts points; exact measurements."""
    L = CFG.local_ba.max_local_points
    gt_poses = []
    for k in range(4):
        xi = np.zeros(6)
        xi[3] = 0.15 * k  # translate along x
        xi[:3] = rng.normal(size=3) * 0.02
        gt_poses.append(np.asarray(se3.exp(jnp.asarray(xi))))
    gt_poses = jnp.asarray(np.array(gt_poses))
    pts = np.stack(
        [rng.uniform(-1.5, 2.0, n_pts), rng.uniform(-1.0, 1.0, n_pts),
         rng.uniform(2.0, 5.0, n_pts)], -1,
    )
    gt_pts = jnp.zeros((L, 3)).at[:n_pts].set(jnp.asarray(pts))

    cams, ptid, uvs, deps = [], [], [], []
    for c in range(4):
        xc = np.asarray(se3.pose_apply(gt_poses[c][None], gt_pts[:n_pts]))
        uv = np.asarray(cam_mod.project(CAM, jnp.asarray(xc)))
        uv = uv + rng.normal(size=uv.shape) * noise_uv
        cams.append(np.full(n_pts, c))
        ptid.append(np.arange(n_pts))
        uvs.append(uv)
        deps.append(xc[:, 2])
    E = 4 * n_pts
    edges = BaEdges(
        cam=jnp.asarray(np.concatenate(cams), jnp.int32),
        pt=jnp.asarray(np.concatenate(ptid), jnp.int32),
        uv=jnp.asarray(np.concatenate(uvs)),
        depth=jnp.asarray(np.concatenate(deps)),
        has_depth=jnp.ones(E, bool),
        info=jnp.ones(E),
        valid=jnp.ones(E, bool),
    )
    return gt_poses, gt_pts, edges, n_pts


def test_schur_equals_dense(rng):
    """The Schur-reduced camera solve must equal eliminating points from the
    full dense normal equations (lam=0, f64 reference)."""
    gt_poses, gt_pts, edges, n_pts = make_ba_problem(rng)
    # Perturb so residuals are non-zero.
    poses = se3.retract(gt_poses, jnp.asarray(rng.normal(size=(4, 6)) * 0.01))
    pts = gt_pts + jnp.asarray(rng.normal(size=gt_pts.shape) * 0.01)
    opt_mask = jnp.array([True, True])

    dense = to_dense(edges, 4, CFG.local_ba.max_local_points)
    dxi, dpt = _lm_solve_step(CFG, poses, pts, dense, opt_mask, jnp.asarray(0.0))

    # Dense reference in float64.
    r, J_cam, J_pt = ba_core.edge_residuals(CFG, poses, pts, edges)
    w, _ = ba_core.robust_weights(CFG, r, edges, CFG.local_ba.huber_delta)
    r = np.asarray(r, np.float64)
    Jc = np.asarray(J_cam, np.float64)
    Jp = np.asarray(J_pt, np.float64)
    w = np.asarray(w, np.float64)
    cam = np.asarray(edges.cam)
    pt = np.asarray(edges.pt)
    nc, npt = 2, n_pts
    D = nc * 6 + npt * 3
    H = np.zeros((D, D))
    b = np.zeros(D)
    for e in range(r.shape[0]):
        blocks = []
        if cam[e] < nc:
            blocks.append((slice(cam[e] * 6, cam[e] * 6 + 6), Jc[e]))
        blocks.append((slice(nc * 6 + pt[e] * 3, nc * 6 + pt[e] * 3 + 3), Jp[e]))
        for sa, Ja in blocks:
            b[sa] += -w[e] * Ja.T @ r[e]
            for sb, Jb in blocks:
                H[sa, sb] += w[e] * Ja.T @ Jb
    H += np.eye(D) * 1e-8
    # match the solver's tiny regularizers: Hpp += 1e-8 I, S += 1e-7 I
    Hcc = H[: nc * 6, : nc * 6]
    Hcp = H[: nc * 6, nc * 6 :]
    Hpp = H[nc * 6 :, nc * 6 :]
    S = Hcc - Hcp @ np.linalg.solve(Hpp, Hcp.T) + 1e-7 * np.eye(nc * 6)
    bs = b[: nc * 6] - Hcp @ np.linalg.solve(Hpp, b[nc * 6 :])
    dxi_ref = np.linalg.solve(S, bs).reshape(nc, 6)
    dpt_ref = np.linalg.solve(Hpp, b[nc * 6 :] - Hcp.T @ dxi_ref.reshape(-1)).reshape(
        npt, 3
    )
    np.testing.assert_allclose(np.asarray(dxi), dxi_ref, atol=5e-4, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(dpt)[:npt], dpt_ref, atol=5e-4, rtol=5e-2)


def test_lm_converges_to_groundtruth(rng):
    gt_poses, gt_pts, edges, n_pts = make_ba_problem(rng)
    poses = se3.retract(gt_poses, jnp.asarray(
        np.concatenate([rng.normal(size=(2, 6)) * 0.03, np.zeros((2, 6))])
    ))
    pts = gt_pts + jnp.asarray(
        np.concatenate([rng.normal(size=(n_pts, 3)) * 0.05,
                        np.zeros((CFG.local_ba.max_local_points - n_pts, 3))])
    )
    opt_mask = jnp.array([True, True])
    lam = jnp.asarray(1e-4)
    dense = to_dense(edges, 4, CFG.local_ba.max_local_points)
    cost0 = float(ba_core.robust_cost(CFG, poses, pts, edges, CFG.local_ba.huber_delta))
    for _ in range(15):
        dxi, dpt = _lm_solve_step(CFG, poses, pts, dense, opt_mask, lam)
        new_poses = jnp.concatenate([se3.retract(poses[:2], dxi), poses[2:]])
        new_pts = pts + dpt
        c_new = float(
            ba_core.robust_cost(CFG, new_poses, new_pts, edges, CFG.local_ba.huber_delta)
        )
        c_old = float(
            ba_core.robust_cost(CFG, poses, pts, edges, CFG.local_ba.huber_delta)
        )
        if c_new < c_old:
            poses, pts, lam = new_poses, new_pts, lam * 0.5
        else:
            lam = lam * 4.0
    cost1 = float(ba_core.robust_cost(CFG, poses, pts, edges, CFG.local_ba.huber_delta))
    assert cost1 < 1e-3 * max(cost0, 1.0), (cost0, cost1)
    # Fixed cameras anchor the gauge, so poses converge to GT absolutely.
    dr, dt = se3.pose_distance(poses[:2], gt_poses[:2])
    assert float(jnp.max(dt)) < 1e-3
    err = jnp.linalg.norm(pts[:n_pts] - gt_pts[:n_pts], axis=-1)
    assert float(jnp.max(err)) < 5e-3


def test_gradcheck_edge_jacobians(rng):
    """Edge Jacobians vs jax.jacobian through the residual function."""
    gt_poses, gt_pts, edges, n_pts = make_ba_problem(rng)
    poses = se3.retract(gt_poses, jnp.asarray(rng.normal(size=(4, 6)) * 0.02))
    pts = gt_pts + jnp.asarray(rng.normal(size=gt_pts.shape) * 0.02)

    _, J_cam, J_pt = ba_core.edge_residuals(CFG, poses, pts, edges)

    def res_wrt_cam(xi):
        p = se3.retract(poses, xi)  # xi: [4, 6] per-camera twist
        r, _, _ = ba_core.edge_residuals(CFG, p, pts, edges)
        return r

    # Jacobian wrt a shared twist applied per-camera; check a few edges.
    take = [0, 57, 123, 180]
    J_auto = jax.jacobian(
        lambda xi: res_wrt_cam(jnp.tile(xi[None], (4, 1)))[jnp.asarray(take)]
    )(jnp.zeros(6))
    np.testing.assert_allclose(
        np.asarray(J_auto), np.asarray(J_cam)[take], atol=5e-2, rtol=1e-2
    )

    def res_wrt_pts(dp):
        r, _, _ = ba_core.edge_residuals(CFG, poses, pts + dp, edges)
        return r[jnp.asarray(take)]

    J_auto_p = jax.jacobian(res_wrt_pts)(jnp.zeros_like(pts))
    for i, e in enumerate(take):
        np.testing.assert_allclose(
            np.asarray(J_auto_p)[i, :, int(edges.pt[e])],
            np.asarray(J_pt)[e],
            atol=5e-2, rtol=1e-2,
        )
