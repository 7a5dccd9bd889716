from trajectory_optimization_tpu.models.pose import PoseProblem, pose_forward, init_pose_params
from trajectory_optimization_tpu.models.traj import (
    TrajProblem,
    traj_forward,
    init_traj_params,
    waypoint_stride,
)

__all__ = [
    "PoseProblem",
    "pose_forward",
    "init_pose_params",
    "TrajProblem",
    "traj_forward",
    "init_traj_params",
    "waypoint_stride",
]
