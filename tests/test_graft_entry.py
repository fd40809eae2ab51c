"""The driver's multi-chip signal: dryrun_multichip must be self-forcing.

Round-1 VERDICT weak #1: the driver invoked dryrun_multichip in a process
where the axon TPU plugin grabbed the backend (libtpu AOT mismatch, rc=1).
The fix is forcing the 8-device CPU mesh INSIDE the function. This test
reproduces the driver's invocation: a fresh subprocess with NO external
platform forcing (we scrub the conftest env).
"""

import pytest
import os
import subprocess
import sys

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_forcing_fresh_process():
    env = dict(os.environ)
    # Undo the conftest/test-env forcing so the subprocess sees what the
    # driver's process would see.
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in out.stdout, out.stdout[-2000:]


def test_dryrun_multichip_inprocess_with_cpu_backend():
    # When a suitable CPU backend is already live (this pytest process),
    # the function must run in-process without complaint.
    sys.path.insert(0, REPO)
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
