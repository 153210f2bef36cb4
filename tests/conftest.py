"""Test harness: CPU backend + an 8-device virtual mesh.

Forces CPU and requests an 8-device virtual mesh via
``xla_force_host_platform_device_count``. The ambient axon sitecustomize
(``/root/.axon_site`` on PYTHONPATH) replaces jax's CPU client with a
tunnel-latency client that ignores that flag — measured: ONE trivial
scalar pull cost 400 s under pytest (the suite's former 317 s
``test_collision_depth`` mystery) and the mesh collapsed to one device.
sitecustomize runs at interpreter startup, before any conftest, so the
only clean fix is to re-exec pytest once with the axon path scrubbed —
done below, guarded by an env flag.

One subtlety: pytest's fd-level capture is already active while initial
conftests load (the capture plugin wraps ``pytest_load_initial_conftests``),
so fds 1/2 point at capture temp files; a bare ``execve`` makes the whole
re-exec'd run write into an orphaned temp file (observed: zero output,
exit 0). pytest keeps a dup of each real fd in ``FDCaptureBase
.targetfd_save`` (pytest 8.4: ``FDCapture``/``FDCaptureBinary`` are
*siblings* under that base) — restore those before exec'ing.
"""

import os
import sys

_AXON_SITE = "/root/.axon_site"
if os.environ.get("_EMPLANNER_AXON_SCRUBBED") != "1" and any(
    _AXON_SITE in p for p in sys.path
):
    try:  # undo pytest's fd capture so the exec'd run keeps real stdio
        import gc

        from _pytest.capture import FDCaptureBase

        for _obj in gc.get_objects():
            if (
                isinstance(_obj, FDCaptureBase)
                and getattr(_obj, "targetfd_save", None) is not None
            ):
                os.dup2(_obj.targetfd_save, _obj.targetfd)
    except Exception:
        pass
    env = dict(os.environ)
    env["_EMPLANNER_AXON_SCRUBBED"] = "1"
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and _AXON_SITE not in p
    )
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, list(sys.orig_argv), env)

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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight fidelity/pixel/camera regressions — the inner "
        "development loop runs `pytest -m 'not slow'` (~8 min); CI / "
        "pre-commit runs the full suite",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
