"""Driver-facing bench.py contract tests (no device work).

The driver runs ``python bench.py`` at round end; these lock the two
behaviors that protect that run: (1) a dead TPU tunnel produces a bounded,
well-formed error JSON line instead of an infinite backend-init hang
(CLAUDE.md "TPU tunnel outages"), and (2) the error line's metric name
matches the success path's so outage records land on the same series.
"""

import pytest

pytestmark = pytest.mark.quick

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_args, env_overrides, timeout=120):
    env = dict(os.environ, **env_overrides)
    # the probe must fail deterministically regardless of real tunnel state;
    # the tunnel plugin overrides JAX_PLATFORMS, so the only reliable way is
    # the probe-snippet override hook
    env["PWR_BENCH_PROBE"] = "raise SystemExit(1)"
    env.pop("PWR_PLATFORM", None)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")] + extra_args,
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def test_tunnel_down_emits_error_line_and_exits():
    r = _run_bench(["--tunnel_wait", "3"], {})
    assert r.returncode == 0, r.stderr[-500:]
    lines = [l for l in r.stdout.splitlines() if l.strip().startswith("{")]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "inference_fps_nyu_stage1_128"
    assert rec["value"] == 0.0
    assert "tpu_tunnel_down" in rec["error"]


def test_tunnel_down_error_metric_matches_config():
    r = _run_bench(
        ["--tunnel_wait", "3", "--stages", "2", "--quant", "int8_static",
         "--norm_method", "batch"], {},
    )
    assert r.returncode == 0, r.stderr[-500:]
    rec = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][0])
    # exactly the tag the success path would use
    assert rec["metric"] == "inference_fps_nyu_stage2_128_int8_static_batchnorm"


def test_forced_platform_skips_probe():
    """PWR_PLATFORM bypasses the liveness gate entirely (offline use):
    with an impossible probe platform but PWR_PLATFORM=cpu, bench must get
    past the gate and start real work (we cap runtime and only check it
    did NOT emit the outage line)."""
    env = dict(os.environ, PWR_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PWR_BENCH_PROBE="raise SystemExit(1)")
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--tunnel_wait", "3", "--batch_size", "2", "--features", "8",
             "--level", "2", "--iters", "2", "--repeat", "1",
             "--no_train", "--no_serving"],
            capture_output=True, text=True, timeout=280, env=env, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return  # got past the gate into (slow CPU) measurement — that's a pass
    assert "tpu_tunnel_down" not in r.stdout
