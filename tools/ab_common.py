"""Shared scaffolding for the tools/ A/B harnesses.

Single source for the timing discipline the perf tools share with bench.py
(round-5 review finding: tools/normrelu_bwd_ab.py and
tools/headconv_bwd_split.py each hand-rolled the scan-sampler closures and
the interleaved round-robin / positive-delta-median summary that bench.py
already exposes — three diverging copies, and the hand-rolled ones lacked
the per-bucket exception isolation bench.py gained in round 4/5):

- ``make_scan_sampler``: the in-jit ``lax.scan`` delta sampler (scan-N
  minus scan-1, per-iteration input perturbation so XLA cannot hoist the
  body) — see bench.py's module docstring for why timing must run inside
  one jitted scan on the axon TPU tunnel.
- ``run_interleaved``: named-variant wrapper over bench.py's
  ``_interleaved_estimate`` (per-sampler exception isolation, banked-
  estimate salvage, median-of->=min_positive-positive-deltas).
- ``print_variants``: the per-variant ms/iter + us/frame report.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_scan_sampler(fn, x0, iters):
    """Compile the scan-``iters``/scan-1 jitted pair for ``fn`` (a scalar-
    returning function of one array), warm both, and return a ``sample()``
    closure yielding per-iteration device seconds."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    f32 = jnp.float32

    def make_scan(n):
        @jax.jit
        def run(x):
            def body(acc, i):
                out = fn(x + i.astype(x.dtype) * jnp.asarray(1e-3, x.dtype))
                return acc + out, None
            acc, _ = lax.scan(body, f32(0.0), jnp.arange(n))
            return acc
        return run

    run_n, run_1 = make_scan(iters), make_scan(1)

    def timed(f):
        t0 = time.perf_counter()
        float(f(x0))
        return time.perf_counter() - t0

    timed(run_1)  # compile + warm
    timed(run_n)

    def sample():
        t1 = timed(run_1)
        tn = timed(run_n)
        return (tn - t1) / (iters - 1)

    return sample


def run_interleaved(samplers, rounds, min_positive=3):
    """Interleave the named samplers (every variant shares the same window
    conditions) via bench.py's estimator; returns
    ``{name: (median_per_iter_seconds_or_None, quality_dict)}``."""
    from bench import _interleaved_estimate

    names = list(samplers)
    results = _interleaved_estimate(
        [samplers[n] for n in names], repeat=rounds,
        min_positive=min_positive)
    return dict(zip(names, results))


def print_variants(results, batch, width=14):
    """Print the per-variant report; returns {name: median} for the
    variants that produced an estimate."""
    med = {}
    for name, (m, quality) in results.items():
        if m is None:
            print(f"  {name:{width}s} unestimable: {quality.get('error')}",
                  flush=True)
            continue
        med[name] = m
        extra = ""
        if "sampler_error" in quality:
            extra = f"  [sampler died late: {quality['sampler_error'][:80]}]"
        print(f"  {name:{width}s} {m*1e3:8.3f} ms/iter  "
              f"{m/batch*1e6:7.2f} us/frame  "
              f"({quality['samples']} samples, "
              f"spread {quality['spread_pct']}%){extra}", flush=True)
    return med
