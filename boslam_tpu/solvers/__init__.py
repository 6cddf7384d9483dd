from boslam_tpu.solvers.pose_opt import optimize_pose, pose_residuals
from boslam_tpu.solvers.ransac import ransac_pnp, ransac_se3, umeyama_fixed_scale

__all__ = [
    "optimize_pose", "pose_residuals", "ransac_pnp", "ransac_se3",
    "umeyama_fixed_scale",
]
