"""Contract tests for bench.py's robust timing estimator.

BENCH_r03 recorded a -7,655.9 fps serving line: the subtraction-based
scan estimator ``(T(scanN)-T(scan1))/(N-1)`` went negative when the
scan-1 window absorbed more tunnel overhead than the scan-N window, and
``min()`` then SELECTED the corrupted sample. These tests lock the
round-4 hardening: a noisy-clock simulation must never produce a negative
or wildly-off estimate, corrupted samples are rejected and re-measured,
and window quality is surfaced in the record.

Pure-Python (no device work) — quick tier.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _interleaved_estimate, _summarize_deltas  # noqa: E402

pytestmark = pytest.mark.quick

TRUE = 1.0e-4  # "true" per-iteration seconds for the simulated clock


def _noisy_sampler(deltas):
    """Sampler replaying a fixed delta sequence (simulated noisy clock)."""
    it = iter(deltas)
    return lambda: next(it)


def test_negative_deltas_cannot_corrupt_estimate():
    # the r03 failure shape: one sample negative (scan-1 absorbed a tunnel
    # stall), the rest sane — min() would pick the negative one
    deltas = [TRUE * 1.02, -3.3e-5, TRUE * 0.98, TRUE * 1.01]
    per_iter, quality = _summarize_deltas(deltas)
    assert per_iter > 0
    assert abs(per_iter - TRUE) / TRUE < 0.05
    assert quality["rejected"] == 1
    assert quality["samples"] == 3


def test_median_resists_positive_outliers():
    # a 10x-slow sample (tunnel hiccup inside scan-N) must not drag the
    # estimate; min() would be fine here but mean would not — median
    # handles both tails
    deltas = [TRUE, TRUE * 1.03, TRUE * 10.0, TRUE * 0.97]
    per_iter, quality = _summarize_deltas(deltas)
    assert abs(per_iter - TRUE) / TRUE < 0.1
    assert quality["spread_pct"] > 100  # the bad window is visible in the record


def test_all_negative_raises_instead_of_emitting_garbage():
    with pytest.raises(RuntimeError, match="no positive timing samples"):
        _summarize_deltas([-1e-5, -2e-5, -3e-5])


def test_interleaved_estimate_remeasures_until_min_positive():
    # first rounds corrupted: the estimator must keep sampling (bounded)
    # until >=3 positive samples rather than report from 2
    seq = [-1e-5, -2e-5, TRUE, TRUE * 1.01, TRUE * 0.99, TRUE]
    (per_iter, quality), = _interleaved_estimate(
        [_noisy_sampler(seq)], repeat=4)
    assert per_iter > 0
    assert quality["samples"] >= 3
    assert quality["rejected"] == 2


def test_interleaved_estimate_round_robins_samplers():
    calls = []

    def mk(tag, value):
        def s():
            calls.append(tag)
            return value
        return s

    results = _interleaved_estimate([mk("a", TRUE), mk("b", 2 * TRUE)], repeat=4)
    # shared-window guarantee: strict a,b,a,b,... ordering
    assert calls == ["a", "b"] * (len(calls) // 2)
    assert abs(results[0][0] - TRUE) < 1e-9
    assert abs(results[1][0] - 2 * TRUE) < 1e-9


def test_quality_fields_shape():
    _, quality = _summarize_deltas([TRUE, TRUE, TRUE, TRUE])
    assert quality == {"samples": 4, "spread_pct": 0.0}


def test_sampler_exception_is_isolated_per_bucket():
    # round-4 advisor medium: a tunnel error while SAMPLING the serving
    # config must not kill the headline estimate mid-run
    def bad():
        raise ConnectionError("tunnel died mid-sample")

    results = _interleaved_estimate([_noisy_sampler([TRUE] * 12), bad], repeat=4)
    per_iter, quality = results[0]
    assert abs(per_iter - TRUE) < 1e-9
    assert quality["samples"] >= 3
    bad_per_iter, bad_quality = results[1]
    assert bad_per_iter is None
    assert "ConnectionError" in bad_quality["error"]


def test_all_negative_bucket_is_isolated_per_bucket():
    # an all-corrupted serving window yields an error marker for that
    # bucket only — the headline bucket still summarizes
    neg = _noisy_sampler([-1e-5] * 12)
    results = _interleaved_estimate([_noisy_sampler([TRUE] * 12), neg], repeat=4)
    assert abs(results[0][0] - TRUE) < 1e-9
    assert results[1][0] is None
    assert "no positive timing samples" in results[1][1]["error"]


def test_late_exception_salvages_banked_estimate():
    # round-5 review: a sampler that dies AFTER banking >= min_positive
    # positive deltas keeps its estimate (the error is surfaced as
    # sampler_error in quality) instead of discarding the measurement
    seq = [TRUE, TRUE * 1.01, TRUE * 0.99]

    def dies_late(it=iter(seq)):
        try:
            return next(it)
        except StopIteration:
            raise ConnectionError("tunnel died after 3 good samples")

    (per_iter, quality), = _interleaved_estimate([dies_late], repeat=4)
    assert abs(per_iter - TRUE) / TRUE < 0.05
    assert quality["samples"] == 3
    assert "ConnectionError" in quality["sampler_error"]


def test_early_exception_with_too_few_positives_is_an_error():
    # the salvage only triggers at >= min_positive banked positives —
    # two good samples then death is still an unestimable bucket
    seq = [TRUE, TRUE * 1.01]

    def dies_early(it=iter(seq)):
        try:
            return next(it)
        except StopIteration:
            raise ConnectionError("tunnel died after 2 samples")

    (per_iter, quality), = _interleaved_estimate([dies_early], repeat=4)
    assert per_iter is None
    assert "ConnectionError" in quality["error"]


def test_single_sampler_failure_returns_error_marker():
    # the caller decides severity: bench.py main() re-raises when the
    # HEADLINE bucket carries an error marker (never emit garbage)
    (per_iter, quality), = _interleaved_estimate(
        [_noisy_sampler([-1e-5] * 12)], repeat=4)
    assert per_iter is None and "error" in quality


def test_min_positive_above_default_collects_more_samples():
    # the train line now demands >=6 positive samples (VERDICT r4 item 5)
    seq = [TRUE * (1 + 0.01 * i) for i in range(20)]
    (per_iter, quality), = _interleaved_estimate(
        [_noisy_sampler(seq)], repeat=6, min_positive=6)
    assert quality["samples"] >= 6
    assert abs(per_iter - TRUE) / TRUE < 0.1


def test_noisy_clock_simulation_bounded_error():
    # randomized adversarial clock: jitter + occasional negative corruption;
    # the estimate must stay within 15% of truth for every seed
    import random

    for seed in range(20):
        rng = random.Random(seed)

        def sample():
            if rng.random() < 0.25:
                return -abs(rng.gauss(TRUE, TRUE))  # corrupted window
            return TRUE * (1.0 + rng.gauss(0, 0.03))

        (per_iter, _), = _interleaved_estimate([sample], repeat=4)
        assert per_iter > 0
        assert abs(per_iter - TRUE) / TRUE < 0.15, seed
