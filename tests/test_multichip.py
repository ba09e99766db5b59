"""Multi-chip dry run on the 8-virtual-device CPU mesh."""

import sys

import pytest

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_bootstraps_devices_in_driver_env():
    """Replicate the grading driver: a fresh process whose backend only has
    ONE device (no conftest, no XLA_FLAGS) must still complete
    dryrun_multichip(8) by self-bootstrapping a virtual CPU mesh — including
    when the 1-device backend was already initialized (round-1 failure mode,
    MULTICHIP_r01.json rc=1)."""
    import os
    import subprocess
    import tempfile
    import time

    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # This scenario NEEDS the real 1-device backend up; a dead TPU tunnel
    # blocks its init with no timeout (observed during outages). The child
    # touches a marker file right after backend init, and we give init a
    # short budget before skipping — a plain run(timeout=900) wasted 15 min
    # of suite time per outage. The CPU bootstrap paths are covered by the
    # other tests either way.
    marker = tempfile.mktemp(prefix="pwr_backend_up_")
    script = (
        "import jax\n"
        "assert jax.device_count() == 1, jax.device_count()\n"  # backend up, 1 device
        f"open({marker!r}, 'w').write('up')\n"
        "import __graft_entry__ as ge\n"
        "ge.dryrun_multichip(8)\n"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", script], env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        deadline = time.time() + 180  # healthy tunnel init is ~20-40 s
        while not os.path.exists(marker) and proc.poll() is None:
            if time.time() > deadline:
                proc.kill()
                proc.communicate()
                pytest.skip("default backend unreachable within 180s "
                            "(TPU tunnel down?)")
            time.sleep(2)
        out, err = proc.communicate(timeout=900)
    finally:
        proc.kill()
        if os.path.exists(marker):
            os.unlink(marker)
    assert proc.returncode == 0, err[-3000:]
    assert "dryrun_multichip(8)" in out


def test_dryrun_pod_scale_32_devices():
    """BASELINE.md names a v5e-32 pod config: the full data-parallel train
    step must compile and execute over a 32-device mesh too (virtual CPU
    devices, own subprocess — the suite's backend is pinned to 8). Env
    mirrors the driver's documented invocation (JAX_PLATFORMS=cpu +
    xla_force_host_platform_device_count), which also keeps the test
    independent of the TPU tunnel's health — without it, the initial
    device probe blocks forever on a dead tunnel."""
    import os
    import subprocess

    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=32"
    script = (
        "import __graft_entry__ as ge\n"
        "ge.dryrun_multichip(32)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip(32)" in proc.stdout


def test_entry_compiles():
    import jax
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    assert out.shape == (8, 14, 3)
