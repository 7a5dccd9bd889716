"""Typed scene-bus messages.

The host-side replacement for the reference's ROS message set
(`src/tools.py:30-34`: PointCloud2, PoseStamped, Path, Odometry, CameraInfo,
Image, TransformStamped). Messages are immutable dataclasses carrying NumPy
arrays; device arrays never cross the bus (nodes transfer at their own
boundaries), and handoff is by value so the reference's tolerated data race
between callbacks (`src/pc_processor.py:134-155`, SURVEY.md §5) cannot occur.

Quaternion conventions: bus messages carry xyzw (ROS wire order); device math
uses wxyz. Conversions live in ops.quat.
"""
from __future__ import annotations

import dataclasses
import itertools
import time
from typing import Optional, Tuple

import numpy as np

_seq_counter = itertools.count()


def now() -> float:
    return time.monotonic()


@dataclasses.dataclass(frozen=True)
class Header:
    stamp: float
    frame_id: str = "world"
    seq: int = 0

    @classmethod
    def make(cls, frame_id: str = "world", stamp: Optional[float] = None) -> "Header":
        return cls(stamp=now() if stamp is None else stamp, frame_id=frame_id,
                   seq=next(_seq_counter))


@dataclasses.dataclass(frozen=True)
class CloudMsg:
    """Point cloud: (N, 3) xyz or (N, 4) xyz+intensity (float32)."""

    header: Header
    points: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "points", np.asarray(self.points, np.float32))

    @property
    def xyz(self) -> np.ndarray:
        return self.points[:, :3]

    @property
    def intensity(self) -> Optional[np.ndarray]:
        return self.points[:, 3] if self.points.shape[1] > 3 else None


@dataclasses.dataclass(frozen=True)
class PoseMsg:
    """Stamped pose: position (3,), orientation xyzw (4,)."""

    header: Header
    position: np.ndarray
    orientation_xyzw: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "position", np.asarray(self.position, np.float64).reshape(3))
        object.__setattr__(
            self, "orientation_xyzw", np.asarray(self.orientation_xyzw, np.float64).reshape(4)
        )

    @property
    def orientation_wxyz(self) -> np.ndarray:
        q = self.orientation_xyzw
        return np.array([q[3], q[0], q[1], q[2]])


@dataclasses.dataclass(frozen=True)
class PathMsg:
    """Waypoint path: positions (W, 3), orientations xyzw (W, 4)."""

    header: Header
    positions: np.ndarray
    orientations_xyzw: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "positions", np.asarray(self.positions, np.float64))
        object.__setattr__(
            self, "orientations_xyzw", np.asarray(self.orientations_xyzw, np.float64)
        )

    @property
    def orientations_wxyz(self) -> np.ndarray:
        q = self.orientations_xyzw
        return np.concatenate([q[:, 3:], q[:, :3]], axis=1)

    @classmethod
    def straight(
        cls, positions, frame_id: str = "world", stamp: Optional[float] = None
    ) -> "PathMsg":
        positions = np.asarray(positions, np.float64)
        quats = np.zeros((len(positions), 4))
        quats[:, 3] = 1.0  # identity xyzw
        return cls(Header.make(frame_id, stamp), positions, quats)


@dataclasses.dataclass(frozen=True)
class CameraInfoMsg:
    """Pinhole camera description (CameraInfo parity: K/D/R/P rows,
    reference `src/tools.py:252-271`)."""

    header: Header
    width: int
    height: int
    K: Tuple[float, ...]  # row-major 3x3
    D: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0, 0.0)
    R: Tuple[float, ...] = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    P: Tuple[float, ...] = ()
    distortion_model: str = "plumb_bob"

    def intrinsics(self):
        from trajectory_optimization_tpu.utils.intrinsics import CameraIntrinsics

        return CameraIntrinsics.from_flat_k(
            self.K, self.width, self.height, frame_id=self.header.frame_id
        )


@dataclasses.dataclass(frozen=True)
class OdometryMsg:
    header: Header
    position: np.ndarray
    orientation_xyzw: np.ndarray
    child_frame_id: str = "base_link"


@dataclasses.dataclass(frozen=True)
class ImageMsg:
    """(H, W, C) uint8 or float image.

    ``data`` may be a host numpy array OR an immutable on-device (jax)
    array — renderer nodes publish device arrays so the device→host image
    transfer is paid only by consumers that actually read pixels
    (``np.asarray(msg.data)``), not on every publish.

    ``wire_format`` records the CompressedImage container the pixels were
    decoded from ('jpeg'/'png'), if any — the bag writer uses it to
    re-encode the stream instead of ballooning it into raw Image records.
    """

    header: Header
    data: "np.ndarray"
    encoding: str = "bgr8"
    wire_format: str = ""


def bgr_to_rgb(img: "np.ndarray", encoding: str) -> "np.ndarray":
    """Return ``img`` in true (RGB) channel order.

    Decoded CompressedImage streams are always rgb8, but user-constructed
    messages default to bgr8 (the cv/ROS convention, see ``ImageMsg``);
    true-colour sinks (PNG/JPEG encoders, dataset extraction) must swap
    BGR(A) bytes or red and blue come out semantically flipped. No-op for
    non-BGR encodings or non-(H, W, >=3) arrays.
    """
    img = np.asarray(img)
    if encoding in ("bgr8", "bgra8") and img.ndim == 3 and img.shape[-1] >= 3:
        img = np.concatenate([img[..., 2::-1], img[..., 3:]], axis=-1)
    return img


@dataclasses.dataclass(frozen=True)
class TransformMsg:
    """Frame-to-frame transform (TransformStamped parity)."""

    header: Header
    child_frame_id: str
    translation: np.ndarray
    rotation_xyzw: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "translation", np.asarray(self.translation, np.float64).reshape(3))
        object.__setattr__(
            self, "rotation_xyzw", np.asarray(self.rotation_xyzw, np.float64).reshape(4)
        )
