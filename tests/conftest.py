"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on a virtual CPU mesh
(``xla_force_host_platform_device_count``) because only one physical TPU chip
is available; the driver separately dry-run-compiles the multi-chip path via
``__graft_entry__.dryrun_multichip``.
"""

import os

# Force CPU even when the ambient environment selects a TPU platform
# (the harness exports JAX_PLATFORMS=axon; setdefault would not override it).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: the suite is dominated by XLA compile time
# (closed-loop scans + QP solvers), which is identical across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/emplanner_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
