"""ctypes loader for the native C++ host kernels, with NumPy fallback.

Builds ``libtrajopt_native.so`` on first use if a toolchain is available
(`make` in this directory); otherwise every entry point falls back to the
pure-NumPy implementation in ops.voxel — identical semantics, just slower.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libtrajopt_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _stale() -> bool:
    """True when the .so is missing or older than its sources — editing
    trajopt_native.cpp (or the build flags) must not leave a stale binary
    silently serving the old code."""
    if not os.path.exists(_LIB_PATH):
        return True
    so_mtime = os.path.getmtime(_LIB_PATH)
    for src in ("trajopt_native.cpp", "Makefile"):
        p = os.path.join(_HERE, src)
        if os.path.exists(p) and os.path.getmtime(p) > so_mtime:
            return True
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if _stale():
            try:
                subprocess.run(
                    ["make", "-sB"], cwd=_HERE, check=True, capture_output=True,
                    timeout=120,
                )
            except (OSError, subprocess.SubprocessError):
                if not os.path.exists(_LIB_PATH):
                    return None
                # no toolchain but a prebuilt .so exists: use it (the
                # AttributeError guards below tolerate missing entry points)
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        lib.voxel_downsample.restype = ctypes.c_int64
        lib.voxel_downsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_float, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.frustum_cull_mask.restype = None
        lib.frustum_cull_mask.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.occupancy_grid.restype = None
        lib.occupancy_grid.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
        ]
        try:  # tolerate a stale prebuilt .so missing newer entry points
            lib.lz4_block_decode.restype = ctypes.c_int64
            lib.lz4_block_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ]
        except AttributeError:
            lib.lz4_block_decode = None
        try:
            lib.lz4_block_encode.restype = ctypes.c_int64
            lib.lz4_block_encode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
        except AttributeError:
            lib.lz4_block_encode = None
        try:
            lib.jpeg_probe.restype = ctypes.c_int32
            lib.jpeg_probe.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.jpeg_decode.restype = ctypes.c_int64
            lib.jpeg_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
        except AttributeError:
            lib.jpeg_probe = None
            lib.jpeg_decode = None
        try:
            lib.jpeg_encode.restype = ctypes.c_int64
            lib.jpeg_encode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
        except AttributeError:
            lib.jpeg_encode = None
        try:
            lib.jpeg_encode_sub.restype = ctypes.c_int64
            lib.jpeg_encode_sub.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
        except AttributeError:
            lib.jpeg_encode_sub = None
        try:
            lib.png_unfilter.restype = ctypes.c_int32
            lib.png_unfilter.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
            ]
        except AttributeError:
            lib.png_unfilter = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def voxel_downsample_native(
    points: np.ndarray,
    leaf_size: float,
    *,
    z_limits: Optional[Tuple[float, float]] = None,
) -> np.ndarray:
    """Centroid voxel-grid downsample — C++ when built, NumPy otherwise."""
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    if pts.ndim != 2 or pts.shape[1] < 3:
        raise ValueError(f"expected (N, >=3) points, got {pts.shape}")
    if lib is None:
        from trajectory_optimization_tpu.ops.voxel import voxel_downsample

        return voxel_downsample(pts, leaf_size, z_limits=z_limits)
    n, dim = pts.shape
    out = np.empty_like(pts)
    zmin, zmax = z_limits if z_limits is not None else (0.0, 0.0)
    m = lib.voxel_downsample(
        _fptr(pts), n, dim, ctypes.c_float(leaf_size),
        1 if z_limits is not None else 0,
        ctypes.c_float(zmin), ctypes.c_float(zmax), _fptr(out), n,
    )
    if m < 0:
        raise ValueError("native voxel_downsample rejected its arguments")
    return out[:m].copy()


def frustum_cull_mask_native(
    cam_points: np.ndarray, K: np.ndarray, img_width: float, img_height: float,
    min_dist: float = 1.0, max_dist: float = 10.0,
) -> np.ndarray:
    """Hard frustum mask — C++ when built, ops.geometry otherwise."""
    lib = _load()
    pts = np.ascontiguousarray(cam_points[:, :3], dtype=np.float32)
    if lib is None:
        import jax.numpy as jnp

        from trajectory_optimization_tpu.ops.geometry import frustum_cull

        m, _, _ = frustum_cull(
            jnp.asarray(pts), jnp.asarray(K, jnp.float32), img_width, img_height,
            min_dist=min_dist, max_dist=max_dist,
        )
        return np.asarray(m).astype(bool)
    mask = np.empty(len(pts), dtype=np.uint8)
    K32 = np.ascontiguousarray(np.asarray(K, np.float32).reshape(-1))
    lib.frustum_cull_mask(
        _fptr(pts), len(pts), _fptr(K32),
        ctypes.c_float(img_width), ctypes.c_float(img_height),
        ctypes.c_float(min_dist), ctypes.c_float(max_dist),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask.astype(bool)


def occupancy_grid_native(
    points: np.ndarray, resolution: float = 0.15,
    x=(0.0, 90.0), y=(-50.0, 50.0), z=(-4.5, 5.5),
) -> np.ndarray:
    """Dense occupancy grid — C++ when built, ops.voxel otherwise."""
    lib = _load()
    if lib is None:
        from trajectory_optimization_tpu.ops.voxel import occupancy_grid

        return occupancy_grid(points, resolution, x, y, z)
    pts = np.ascontiguousarray(points[:, :3], dtype=np.float32)
    dims = (
        int((x[1] - x[0]) / resolution),
        int((y[1] - y[0]) / resolution),
        int(round((z[1] - z[0]) / resolution)),
    )
    grid = np.empty(dims, dtype=np.uint8)
    lib.occupancy_grid(
        _fptr(pts), len(pts), ctypes.c_float(resolution),
        ctypes.c_float(x[0]), ctypes.c_float(x[1]),
        ctypes.c_float(y[0]), ctypes.c_float(y[1]),
        ctypes.c_float(z[0]), ctypes.c_float(z[1]),
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return grid.astype(np.float64)


def jpeg_decode_native(data: bytes) -> Optional[np.ndarray]:
    """Decode a baseline or progressive JPEG with the C++ from-spec decoder.

    Returns (H, W) gray or (H, W, 3) RGB uint8; None when the native
    library is unavailable (callers fall back to the NumPy decoder in
    bus.jpeg — identical numerics). Raises the bus.jpeg exception types
    on malformed / unsupported streams so callers handle one error
    surface regardless of backend.
    """
    lib = _load()
    if lib is None or getattr(lib, "jpeg_decode", None) is None:
        return None
    from trajectory_optimization_tpu.bus.jpeg import JpegError, UnsupportedJpegError

    src = np.frombuffer(data, dtype=np.uint8)
    sp = src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    nc = ctypes.c_int32()
    rc = lib.jpeg_probe(sp, len(src), ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(nc))
    if rc == -2:
        raise UnsupportedJpegError("unsupported JPEG coding (native probe)")
    if rc != 0:
        raise JpegError("malformed JPEG (native probe)")
    out = np.empty(h.value * w.value * nc.value, dtype=np.uint8)
    n = lib.jpeg_decode(sp, len(src),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        out.shape[0])
    if n == -2:
        raise UnsupportedJpegError("unsupported JPEG coding (native decode)")
    if n < 0:
        raise JpegError(f"malformed JPEG (native decode rc={n})")
    if nc.value == 1:
        return out.reshape(h.value, w.value)
    return out.reshape(h.value, w.value, nc.value)


def jpeg_encode_native(img: np.ndarray, quality: int = 85,
                       subsampling: str = "444") -> Optional[bytes]:
    """Encode uint8 gray/(H,W,3) RGB as baseline JPEG (4:4:4 or 4:2:0)
    in C++.

    Returns None when the native library is unavailable, or lacks the
    jpeg_encode_sub entry point and 4:2:0 was requested (bus.jpeg's
    Python encoder is the fallback — same tables/design, ~100x slower).
    """
    lib = _load()
    if lib is None or getattr(lib, "jpeg_encode", None) is None:
        return None
    # gray has no chroma: route it to the 4:4:4 entry point regardless of
    # the requested subsampling (identical stream; keeps a stale prebuilt
    # .so without jpeg_encode_sub off the ~100x slower Python fallback)
    sub420 = subsampling == "420" and np.asarray(img).ndim == 3
    if sub420 and getattr(lib, "jpeg_encode_sub", None) is None:
        return None  # stale prebuilt .so without the 4:2:0 entry point
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"JPEG encode needs uint8 input, got {img.dtype}")
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        ncomp = 1
    elif img.ndim == 3 and img.shape[2] == 3:
        ncomp = 3
    else:
        raise ValueError(f"cannot encode shape {img.shape} as JPEG")
    h, w = int(img.shape[0]), int(img.shape[1])
    if h == 0 or w == 0:
        raise ValueError("empty image")
    # Entropy-coded noise at quality ~100 can exceed the raw size (~2.2x
    # measured); start at 2x + headers and retry once at 4x before handing
    # the frame to the growable pure-Python encoder (return None).
    for mult in (2, 4):
        cap = mult * h * w * ncomp + (1 << 16)
        out = np.empty(cap, dtype=np.uint8)
        src = img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        dst = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if sub420:
            n = lib.jpeg_encode_sub(src, h, w, ncomp, int(quality), 1,
                                    dst, cap)
        else:
            n = lib.jpeg_encode(src, h, w, ncomp, int(quality), dst, cap)
        if n != -3:  # -3 = output buffer overflow
            break
    if n == -3:
        return None
    if n < 0:
        raise ValueError(f"native jpeg_encode failed rc={n}")
    return out[:n].tobytes()


def png_unfilter_native(raw: bytes, height: int, stride: int,
                        bpp: int) -> Optional[np.ndarray]:
    """Undo PNG scanline filtering natively -> (height, stride) uint8.

    Returns None when the native library is unavailable (bus.png falls
    back to its NumPy/Python loops). Raises ValueError on a bad filter
    byte, matching the fallback's PngError site.
    """
    lib = _load()
    if lib is None or getattr(lib, "png_unfilter", None) is None:
        return None
    src = np.frombuffer(raw, dtype=np.uint8)
    out = np.empty((height, stride), dtype=np.uint8)
    rc = lib.png_unfilter(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(height), int(stride), int(bpp),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError("bad PNG filter type")
    return out


def lz4_block_encode_native(src: bytes) -> Optional[bytes]:
    """Compress one LZ4 block in C++. Returns the compressed bytes,
    ``b""`` when the data does not shrink (output would reach
    ``len(src)`` — caller stores the block; do NOT retry in Python, the
    encoders are bit-identical), or None when the native library is
    unavailable (caller may fall back to the pure-Python encoder)."""
    lib = _load()
    if lib is None or getattr(lib, "lz4_block_encode", None) is None:
        return None
    s = np.frombuffer(src, dtype=np.uint8)
    cap = len(s) - 1
    if cap <= 0:
        return b""
    dst = np.empty(cap, dtype=np.uint8)
    n = lib.lz4_block_encode(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(s),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if n < 0:
        return b""
    return dst[:n].tobytes()


def lz4_block_decode_native(src: bytes, dst: np.ndarray, dst_pos: int):
    """Decode one LZ4 block into ``dst`` (uint8, C-contiguous) at ``dst_pos``.

    Returns the new write position, or None when the native library is
    unavailable (callers fall back to the pure-Python decoder in bus.lz4).
    Raises ValueError on malformed input / insufficient capacity.
    """
    lib = _load()
    if lib is None or lib.lz4_block_decode is None:
        return None
    s = np.frombuffer(src, dtype=np.uint8)
    new_pos = lib.lz4_block_decode(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(s),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(dst_pos), int(dst.shape[0]),
    )
    if new_pos < 0:
        raise ValueError("malformed LZ4 block (or output buffer too small)")
    return int(new_pos)
