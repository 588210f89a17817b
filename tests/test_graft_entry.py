"""Driver-artifact regression tests: `__graft_entry__.dryrun_multichip`
must self-provision the virtual device mesh under the driver's exact
invocation (fresh interpreter, host-default env — round-1 MULTICHIP
failure mode), including when the jax backend was already initialized
short before the call (re-exec fallback)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Printed by the test child between its host-default backend init and the
# dryrun proper, so a timeout can be attributed: no sentinel -> the REAL
# TPU backend hung initializing (tunnel down — environmental, skip);
# sentinel present -> the CPU-mesh dryrun itself hung (a real bug, fail).
_SENTINEL = "__backend_init_done__"


def _run(code: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # Strip the conftest-applied CPU overrides so the child sees the same
    # env the driver would (the host may re-latch its own platform there).
    env.pop("_CAPTIONKIT_MULTICHIP_REEXEC", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    try:
        return subprocess.run(
            [sys.executable, "-c", code],
            env=env,
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=600,
        )
    except subprocess.TimeoutExpired as e:
        out = e.stdout or b""
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        if _SENTINEL in code and _SENTINEL not in out:
            pytest.skip(
                "real-device jax backend init hung >600s (TPU tunnel "
                "down?) before the CPU-mesh dryrun even started — "
                "environmental, not a dryrun_multichip regression"
            )
        raise


def test_dryrun_multichip_driver_invocation():
    proc = _run(
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    for fam in ("XE multistep", "SCST rollout+update", "beam decode",
                "2-level (dcn,ici)"):
        assert fam in proc.stdout and "ok" in proc.stdout, proc.stdout


def test_dryrun_multichip_after_backend_init():
    # Backend initialized (possibly at 1 device) before the call: the
    # fallback must re-exec a fresh interpreter and still succeed.
    proc = _run(
        "import jax; jax.devices(); "
        f"print({_SENTINEL!r}, flush=True); "
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    for fam in ("XE multistep", "SCST rollout+update", "beam decode"):
        assert fam in proc.stdout and "ok" in proc.stdout, proc.stdout
