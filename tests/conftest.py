"""Test harness: CPU backend (+ a virtual multi-device mesh when possible).

Forces CPU and requests an 8-device virtual mesh via
``xla_force_host_platform_device_count``. Caveat: when the ambient axon
sitecustomize is on PYTHONPATH it replaces jax's CPU client, which ignores
that flag — the suite then runs on one device and the mesh tests adapt
(tests/test_fleet.py). True 8-way sharding is validated by
``__graft_entry__.dryrun_multichip`` in a clean environment (the driver does
this; manual check: ``env -i PATH=... /opt/venv/bin/python -c "import
__graft_entry__ as g; g.dryrun_multichip(8)"``).
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
