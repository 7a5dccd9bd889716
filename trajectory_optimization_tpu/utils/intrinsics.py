"""Camera intrinsics container.

Parity: reference `src/tools.py:320-325` (`load_intrinsics`) hardcodes the
SubT robot camera K (fx=758.03967, fy=761.62359, cx=621.46572, cy=756.86402)
with a 1232x1616 image; reference `src/tools.py:252-259`
(`publish_camera_info`) carries the same K plus distortion D, rectification R
and projection P rows. Here the intrinsics are a typed, immutable dataclass
usable both host-side (bus messages) and device-side (jnp arrays).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Pinhole camera intrinsics + image size.

    Attributes:
      fx, fy: focal lengths in pixels.
      cx, cy: principal point in pixels.
      width, height: image size in pixels (floats, as the reference treats
        them: they enter smooth-mask math as continuous scales).
      distortion: plumb-bob distortion coefficients (informational; the
        visibility model is distortion-free, as in the reference).
    """

    fx: float
    fy: float
    cx: float
    cy: float
    width: float
    height: float
    distortion: tuple = (0.0, 0.0, 0.0, 0.0, 0.0)
    frame_id: str = "camera_frame"

    def matrix(self, dtype=jnp.float32) -> jnp.ndarray:
        """3x3 camera matrix K."""
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=dtype,
        )

    def matrix_np(self, dtype=np.float32) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=dtype,
        )

    def matrix4(self, dtype=jnp.float32) -> jnp.ndarray:
        """4x4 homogeneous camera matrix (reference `src/pc_processor.py:145-152`)."""
        K = jnp.zeros((4, 4), dtype=dtype)
        K = K.at[0, 0].set(self.fx).at[0, 2].set(self.cx)
        K = K.at[1, 1].set(self.fy).at[1, 2].set(self.cy)
        K = K.at[2, 2].set(1.0).at[3, 3].set(1.0)
        return K

    @classmethod
    def from_matrix(
        cls, K: Sequence[Sequence[float]] | np.ndarray, width: float, height: float, **kw
    ) -> "CameraIntrinsics":
        K = np.asarray(K, dtype=np.float64)
        return cls(
            fx=float(K[0, 0]),
            fy=float(K[1, 1]),
            cx=float(K[0, 2]),
            cy=float(K[1, 2]),
            width=float(width),
            height=float(height),
            **kw,
        )

    @classmethod
    def from_flat_k(cls, K: Sequence[float], width: float, height: float, **kw) -> "CameraIntrinsics":
        """From a row-major 9-element K (CameraInfo message layout)."""
        K = np.asarray(K, dtype=np.float64).reshape(3, 3)
        return cls.from_matrix(K, width, height, **kw)


# The reference robot camera (`src/tools.py:320-325`).
_DEFAULT = CameraIntrinsics(
    fx=758.03967,
    fy=761.62359,
    cx=621.46572,
    cy=756.86402,
    width=1232.0,
    height=1616.0,
    distortion=(-0.20571, 0.04103, -0.00101, 0.00098, 0.0),
)


def default_intrinsics() -> CameraIntrinsics:
    """The hardcoded SubT robot camera used by all reference demos."""
    return _DEFAULT
