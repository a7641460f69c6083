"""Real-Mosaic (non-interpret) kernel + end-to-end parity, run ON the TPU.

The rest of the suite forces JAX_PLATFORMS=cpu (conftest) and exercises the
Pallas kernels via interpret=True only — a Mosaic miscompile would pass the
suite and only trip the bench guard (VERDICT r2 weak #6). These tests close
that gap: they spawn subprocesses WITHOUT the cpu override so the axon TPU
backend is used, and run the kernel-level and end-to-end parity harnesses.

Skipped unless RUSTPOTTER_TPU_TESTS=1 (set it in the bench environment):

    RUSTPOTTER_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

First run pays the Mosaic compiles (~5 min each through the remote-compile
tunnel); repeats hit the persistent cache shared with tools/kernel_probe.py.
"""
import os
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("RUSTPOTTER_TPU_TESTS") != "1",
        reason="real-TPU tests run only with RUSTPOTTER_TPU_TESTS=1",
    ),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_clean(script, *args, timeout=1800):
    """Run a tool in a subprocess without the suite's cpu platform override."""
    env = {k: v for k, v in os.environ.items()}
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""  # drop the virtual-8-device CPU flag
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    return proc.stdout


def test_mosaic_kernel_parity(resources):
    out = _run_clean("tpu_kernel_parity.py", "8192")
    assert "KERNEL PARITY OK" in out


def test_mosaic_end_to_end_golden(resources):
    out = _run_clean("tpu_parity.py", "1024")
    assert "PARITY OK" in out
