from trajectory_optimization_tpu.bus.messages import (
    CameraInfoMsg,
    CloudMsg,
    Header,
    ImageMsg,
    OdometryMsg,
    PathMsg,
    PoseMsg,
    TransformMsg,
)
from trajectory_optimization_tpu.bus.core import Bus, ApproximateTimeSynchronizer
from trajectory_optimization_tpu.bus.frames import FrameGraph
from trajectory_optimization_tpu.bus.viewer import ViewerNode

__all__ = [
    "ViewerNode",
    "Bus",
    "ApproximateTimeSynchronizer",
    "FrameGraph",
    "Header",
    "CloudMsg",
    "PoseMsg",
    "PathMsg",
    "CameraInfoMsg",
    "OdometryMsg",
    "ImageMsg",
    "TransformMsg",
]
