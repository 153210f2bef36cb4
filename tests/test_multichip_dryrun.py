"""The driver-protocol multi-chip dryrun must pass from the ambient env.

Round-1 verdict item 1: ``MULTICHIP_r01.json`` recorded rc=1 because the
axon sitecustomize hijacks in-process platform selection. The fix re-execs
the dryrun in a subprocess with ``/root/.axon_site`` scrubbed from
PYTHONPATH; this test pins that contract exactly as the driver invokes it
(a fresh interpreter with the ambient environment).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_8_from_ambient_env():
    env = dict(os.environ)
    # Reconstruct the driver's ambient view: make sure our conftest's CPU
    # override does not leak into the child via inherited env (the driver
    # runs with JAX_PLATFORMS=axon and PYTHONPATH=/root/.axon_site).
    env.pop("_EMPLANNER_DRYRUN_CHILD", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK: 8 devices" in proc.stdout
