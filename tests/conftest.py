"""Test config: force an 8-virtual-device CPU platform so sharding tests run
without TPU hardware, per the build contract (multi-chip is validated on a
virtual mesh; the real chip is for benchmarks only)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# cache XLA compilations across test runs (compiles dominate CPU test time)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize registers the TPU plugin at interpreter
# startup and overrides jax_platforms; force it back to CPU before any
# backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


DATA_POINTS = os.path.join(os.path.dirname(__file__), "..", "data", "points", "point_cloud_10.npz")
DATA_PATH = os.path.join(os.path.dirname(__file__), "..", "data", "paths", "path_poses_10.npz")


@pytest.fixture(scope="session")
def cloud10():
    """The reference benchmark cloud: 40452 x 3 (index 10)."""
    pts = np.load(DATA_POINTS)["pts"]
    if pts.shape[0] < pts.shape[1]:
        pts = pts.T
    return pts.astype(np.float32)


@pytest.fixture(scope="session")
def path10():
    """The reference benchmark path: 27 x 3 waypoints (index 10)."""
    return np.load(DATA_PATH)["poses"].astype(np.float32)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
