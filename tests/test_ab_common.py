"""Contract tests for tools/ab_common.py — the scaffolding the perf A/B
tools share with bench.py (round-5 review finding: the hand-rolled copies
lacked the estimator's per-bucket isolation). No jax: run_interleaved and
print_variants are pure-host plumbing over bench._interleaved_estimate,
which has its own contract suite (tests/test_bench_estimator.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from ab_common import print_variants, run_interleaved  # noqa: E402

pytestmark = pytest.mark.quick

TRUE = 0.004


def test_run_interleaved_names_and_medians():
    results = run_interleaved(
        {"a": lambda: TRUE, "b": lambda: 2 * TRUE}, rounds=3)
    assert set(results) == {"a", "b"}
    med_a, q_a = results["a"]
    med_b, q_b = results["b"]
    assert abs(med_a - TRUE) / TRUE < 1e-9
    assert abs(med_b - 2 * TRUE) / (2 * TRUE) < 1e-9
    assert q_a["samples"] >= 3 and q_b["samples"] >= 3


def test_run_interleaved_isolates_a_dead_variant():
    # one variant raising mid-run must not lose the other's estimate —
    # exactly the failure mode the shared estimator exists to prevent
    def dies():
        raise ConnectionError("tunnel hiccup")

    results = run_interleaved({"ok": lambda: TRUE, "dead": dies}, rounds=3)
    med_ok, _ = results["ok"]
    med_dead, q_dead = results["dead"]
    assert abs(med_ok - TRUE) / TRUE < 1e-9
    assert med_dead is None
    assert "ConnectionError" in q_dead["error"]


def test_print_variants_reports_and_skips_unestimable(capsys):
    results = {
        "fast": (TRUE, {"samples": 4, "spread_pct": 1.0}),
        "broken": (None, {"error": "no positive timing samples"}),
    }
    med = print_variants(results, batch=128)
    out = capsys.readouterr().out
    assert med == {"fast": TRUE}
    assert "us/frame" in out and "unestimable" in out
