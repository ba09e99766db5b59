"""Benchmark: flagship-model inference + training throughput on one chip.

Prints the headline inference JSON line first
({"metric", "value", "unit", "vs_baseline"}), then a second JSON line with
the fused train-step throughput (train_fps; --no_train to skip).
Baseline (BASELINE.json north star): 10,000 depth frames/sec/chip at 128x128
inference. The measured config is BASELINE.json configs[0] — "NYU test.py
inference: stage-1 hourglass, 128x128 crops" (14 joints, features=128,
level=4, bf16).

Speed-of-light note: the 2-stage default model is 21.8 GFLOP/frame, which
caps at ~9.1k fps on v5e's 197 bf16 TFLOP/s even at 100% MXU utilization —
above-10k headline throughput is only physical for the stage-1 inference
config (13.0 GFLOP/frame, SoL ~15.1k fps). Pass --stages 2 to measure the
flagship training architecture.

Timing methodology: the remote-tunnel runtime used in this environment makes
``block_until_ready`` unreliable (returns before execution) and adds ~seconds
of fixed overhead to any device->host fetch. So the benchmark runs N model
invocations *inside one jitted lax.scan* (each iteration's input perturbed so
XLA cannot hoist the body), reduces to one scalar, and subtracts a scan
length-1 baseline measured the same way:

    per_iter = (T(scan N) - T(scan 1)) / (N - 1)

which cancels upload, dispatch and fetch overheads.

Estimator robustness (round-4 hardening): a subtraction-based estimator
can go NEGATIVE when the scan-1 window absorbs more tunnel/fetch overhead
than the scan-N window — BENCH_r03 recorded a physically meaningless
-7,655.9 fps serving line exactly this way, while the same config measured
12,289 fps an hour earlier. So every reported line now (a) collects
``--repeat`` (default 4) delta samples, (b) REJECTS non-positive deltas
and keeps sampling until >=3 positive samples (bounded), (c) reports the
MEDIAN of the positive samples, and (d) carries ``samples``/``spread_pct``
fields so window quality is visible in the record. The headline and
serving lines are sampled INTERLEAVED (headline, serving, headline, ...)
so both share window conditions (PERF.md: the serving config drifts
12.2-13.2k across windows).
"""

import argparse
import json
import statistics
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--iters", type=int, default=16)
    parser.add_argument("--repeat", type=int, default=4,
                        help="timing samples per metric (>=4; the estimator "
                             "additionally re-measures until >=3 POSITIVE "
                             "deltas and reports their median + spread)")
    parser.add_argument("--dtype", type=str, default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--decoder", type=str, default="pallas", choices=["xla", "pallas"],
                        help="fused Pallas decoder (default, matches the CLI "
                             "surface): the bf16 fast_boundary path ties XLA "
                             "forward-only (PERF.md) and wins the fused "
                             "backward in training")
    parser.add_argument("--quant", type=str, default="none",
                        help="int8 MXU inference quantization, "
                             "'int8[_static][_all|_heads]' (serving path; "
                             "394 int8 TOPs vs 197 bf16 TFLOP/s on v5e). "
                             "static modes calibrate on one batch first")
    parser.add_argument("--joints", type=int, default=14)
    parser.add_argument("--stages", type=int, default=1)
    parser.add_argument("--features", type=int, default=128)
    parser.add_argument("--level", type=int, default=4)
    parser.add_argument("--norm_method", type=str, default="instance_anchored",
                        choices=["instance", "instance_fast",
                                 "instance_anchored", "batch"],
                        help="default instance_anchored = calibrated-anchor "
                             "one-pass statistics (one-pass fusion/speed, "
                             "trained-checkpoint parity <0.01 mm, exact "
                             "two-pass fallback for anchor-less torch "
                             "checkpoints). 'instance' = always-exact "
                             "two-pass (~19%% slower). batch norm folds to "
                             "a constant affine at inference — the int8 "
                             "modes only pay off there")
    parser.add_argument("--engine", type=str, default="auto",
                        choices=["auto", "fused", "flax", "unit"],
                        help="'unit' = per-unit fused conv+instance-norm "
                             "Pallas kernels (make_unit_fused_apply); "
                             "'fused' = whole-hourglass-kernel engine. Both "
                             "are RETIRED measurement substrates (round-3 "
                             "close-out, PERF.md: neither beats model.apply, "
                             "and the anchored norm removed the var-pass "
                             "read they existed to save). 'auto' = "
                             "model.apply, the shipped serving path")
    parser.add_argument("--min_res", type=int, default=32,
                        help="unit engine: fuse hourglass ResBlocks at "
                             "resolution >= this (below it XLA wins on "
                             "launch overhead)")
    parser.add_argument("--train", dest="train", action="store_true", default=None,
                        help="also measure the fused train step (raw 480x640 "
                             "frames -> on-device preprocess+aug -> fwd/bwd "
                             "-> AdamW) and report it as 'train_fps' in the "
                             "same JSON line. Default: on for TPU, off on a "
                             "CPU host (a batch-128 2-stage fwd/bwd takes "
                             "minutes there)")
    parser.add_argument("--no_train", dest="train", action="store_false")
    parser.add_argument("--train_batch_size", type=int, default=128)
    parser.add_argument("--serving", dest="serving", action="store_true",
                        default=None,
                        help="also measure the fastest supported serving "
                             "config (batch norm + int8_static_all; "
                             "~0.4 mm accuracy caveat) as a third JSON "
                             "line. Default: on for TPU")
    parser.add_argument("--no_serving", dest="serving", action="store_false")
    parser.add_argument("--tunnel_wait", type=int, default=900,
                        help="max seconds to wait for the TPU tunnel before "
                             "emitting an error JSON line instead of hanging "
                             "(backend init blocks FOREVER when the axon "
                             "tunnel is down — see CLAUDE.md). 0 = no probe")
    args = parser.parse_args()

    from pixelwiseregression_tpu.cli.common import apply_platform_override
    from pixelwiseregression_tpu.utils.compile_cache import enable_compile_cache

    apply_platform_override()
    enable_compile_cache()
    _wait_for_backend(args)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from pixelwiseregression_tpu.models import PixelwiseRegression

    if args.train is None:  # mirror the chip-health guard: TPU-only default
        args.train = jax.devices()[0].platform == "tpu"
    if args.serving is None:
        args.serving = jax.devices()[0].platform == "tpu"

    if args.engine in ("fused", "unit") and args.norm_method != "instance":
        # both retired engines are instance-norm measurement substrates
        # (their builders reject any other norm form); keep them runnable
        # under the anchored default
        import sys

        print(f"# --engine {args.engine} measures the fused instance-norm "
              f"kernels; forcing --norm_method instance "
              f"(was {args.norm_method})", file=sys.stderr)
        args.norm_method = "instance"

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    decoder = args.decoder
    if jax.devices()[0].platform == "cpu" and decoder == "pallas":
        decoder = "xla"  # pallas TPU kernels only interpret on CPU (slow)

    model = PixelwiseRegression(
        joints=args.joints, stage=args.stages, label_size=64,
        features=args.features, level=args.level,
        norm_method=args.norm_method, heatmap_method="softmax",
        decoder=decoder, dtype=dtype,
        quant=None if args.quant == "none" else args.quant,
    )
    b = args.batch_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, 128, 128, 1), jnp.float32)
    label = jnp.asarray(rng.rand(b, 64, 64, 1), jnp.float32)
    mask = jnp.asarray((rng.rand(b, 64, 64, 1) > 0.3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img[:1], label[:1], mask[:1], train=False)
    if "static" in args.quant:
        _, upd = model.apply(variables, img, label, mask, train=False,
                             mutable=["quant_scales"])
        variables = dict(variables, **upd)

    engine = args.engine
    if engine == "auto":
        # 'flax' until the fused engine's hourglass kernel beats XLA on the
        # measured configs (tracking in PERF.md); pass --engine fused to
        # measure the kernel path
        engine = "flax"
    if engine == "unit":
        from pixelwiseregression_tpu.models.infer_engine import make_unit_fused_apply

        unit_fn = make_unit_fused_apply(model, variables, min_res=args.min_res)
        forward = lambda variables, im, la, ma: unit_fn(im, la, ma)
    elif engine == "fused":
        from pixelwiseregression_tpu.models.infer_engine import make_fused_apply

        fused_fn = make_fused_apply(model, variables)
        forward = lambda variables, im, la, ma: fused_fn(im, la, ma)
    else:
        forward = lambda variables, im, la, ma: model.apply(
            variables, im, la, ma, train=False)

    headline_sampler = _make_forward_sampler(
        forward, variables, img, label, mask, args.iters)

    # Build the serving sampler BEFORE timing so the headline and serving
    # lines can be sampled interleaved (shared window conditions — PERF.md:
    # the serving config is the one most sensitive to window drift). A
    # serving build failure degrades to headline-only, never loses it.
    serving_sampler, serving_err = None, None
    if args.serving:
        try:
            serving_sampler = _make_serving_sampler(args)
        except Exception as e:  # noqa: BLE001 — never lose the headline
            serving_err = f"{type(e).__name__}: {e}"[:200]

    samplers = [headline_sampler] + ([serving_sampler] if serving_sampler else [])
    estimates = _interleaved_estimate(samplers, args.repeat)
    per_frame, quality = estimates[0]
    if per_frame is None:
        # the headline must never be emitted as garbage — an unestimable
        # window is a hard failure (matches the estimator contract tests)
        raise RuntimeError(f"headline estimate failed: {quality['error']}")
    fps = args.batch_size / per_frame

    qtag = "" if args.quant == "none" else f"_{args.quant}"
    # the default (anchored) config carries the bare headline metric name;
    # non-default norm forms are tagged
    ntag = ("" if args.norm_method == "instance_anchored"
            else f"_{args.norm_method}norm")
    # headline line FIRST so it is captured even if anything below
    # (health probe compile, long-compiling train measurement) is cut off
    # by a harness timeout
    print(json.dumps({
        "metric": f"inference_fps_nyu_stage{args.stages}_128{qtag}{ntag}",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 10000.0, 4),
        "engine": engine,
        **quality,
    }), flush=True)

    # Chip-health reference: a fixed CHAINED bf16 matmul loop. It is
    # latency-bound, so its healthy value on this chip is ~68-70 TFLOP/s
    # effective (NOT the 197 TF peak); a materially lower reading means the
    # chip/tunnel is contended and the fps numbers should be distrusted.
    # TPU-only (it would take minutes on a CPU host) and after the
    # headline print.
    if jax.devices()[0].platform == "tpu":
        try:
            print(json.dumps({
                "metric": "chip_health_matmul_tflops",
                "value": _chip_health_tflops(jax, jnp, lax, np),
                "unit": "TFLOP/s",
                "healthy_reference": 69.0,
            }), flush=True)
        except Exception:
            pass

    if args.serving:
        if serving_sampler is not None and estimates[1][0] is None:
            # sampling-time serving failure (advisor round-4 medium):
            # isolated by the estimator — report it without losing anything
            serving_sampler, serving_err = None, estimates[1][1]["error"]
        if serving_sampler is not None:
            sper, squality = estimates[1]
            sfps = args.batch_size / sper
            print(json.dumps({
                "metric": f"serving_fps_nyu_stage{args.stages}_128_int8_batchnorm",
                "value": round(sfps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(sfps / 10000.0, 4),
                **squality,
                "caveat": "int8_static_all + batch norm: fastest supported "
                          "serving mode; measured accuracy cost ~0.4 mm "
                          "mean per-joint vs f32 (PERF.md) — opt-in, not "
                          "the parity path; sampled interleaved with the "
                          "headline line (shared window)",
            }), flush=True)
        else:
            print(json.dumps({"metric": f"serving_fps_nyu_stage{args.stages}"
                                        "_128_int8_batchnorm",
                              "error": serving_err}),
                  flush=True)

    if args.train:
        try:
            record = bench_train(args)
            # Speed-of-light context (VERDICT r3 item 3): 2-stage fwd is
            # 21.8 GFLOP/frame (PERF.md FLOP table); backward costs ~2x
            # forward (dx + dW conv pairs — the StableHLO audit counted
            # exact backward pairs for all 88 forward convs), so fwd+bwd
            # ~= 65.4 GFLOP/frame. v5e bf16 peak 197 TFLOP/s => SoL
            # ~3,012 f/s at 100% MXU utilization — the 3k "baseline" IS
            # speed-of-light; measured realistic ceiling is ~75-80% SoL
            # (~2.3-2.5k, PERF.md round-2 reality check).
            sol_fps = 197.0e12 / (3 * 21.8e9)
            print(json.dumps({
                "metric": "train_fps_nyu_stage2_raw640x480",
                "value": record["train_fps"],
                "unit": "frames/sec/chip",
                # reference hot loop baseline: north-star >3k frames/s
                "vs_baseline": round(record["train_fps"] / 3000.0, 4),
                "sol_frames_per_sec": round(sol_fps),
                "pct_of_sol": round(100.0 * record["train_fps"] / sol_fps, 1),
                "sol_note": "baseline 3k = 100% MXU speed-of-light for "
                            "2-stage fwd+bwd (3x21.8 GFLOP/frame at 197 "
                            "bf16 TFLOP/s); measured ceiling ~75-80% SoL",
                "ms_per_step": record["train_ms_per_step"],
                "batch_size": record["train_batch_size"],
                **record.get("quality", {}),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — never lose the headline line
            print(json.dumps({"metric": "train_fps_nyu_stage2_raw640x480",
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


def _wait_for_backend(args):
    """Bounded TPU-tunnel liveness gate (probe in a subprocess, retry).

    When the axon tunnel is down, ANY jax backend init in this process
    blocks with no timeout (CLAUDE.md "TPU tunnel outages") — a driver
    running ``python bench.py`` would hang and the round would record
    nothing. Probe ``jax.devices()`` in a killable subprocess instead,
    retrying up to ``--tunnel_wait`` seconds (outages are often transient);
    on final failure print the headline JSON line with an ``error`` field
    so the record shows a documented outage, not a silent absence.

    Skipped when a platform is forced via ``PWR_PLATFORM`` (offline/CPU
    use never touches the tunnel).
    """
    import os
    import subprocess
    import sys

    if os.environ.get("PWR_PLATFORM") or args.tunnel_wait <= 0:
        return
    # tests override the probe snippet (PWR_BENCH_PROBE="raise SystemExit(1)")
    # because the tunnel plugin overrides JAX_PLATFORMS — there is no env
    # that makes the real probe fail deterministically while the tunnel is up
    probe_src = os.environ.get("PWR_BENCH_PROBE", "import jax; jax.devices()")
    deadline = time.time() + args.tunnel_wait
    attempt = 0
    while True:
        attempt += 1
        try:
            # healthy first init through the tunnel takes ~20-40s, so the
            # probe needs a generous timeout — but never longer than the
            # caller's remaining wait budget
            r = subprocess.run(
                [sys.executable, "-c", probe_src],
                timeout=min(150.0, max(10.0, deadline - time.time())),
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            # mirror the success-path metric name exactly so the outage
            # record lands on the same series
            qtag = "" if args.quant == "none" else f"_{args.quant}"
            ntag = ("" if args.norm_method == "instance_anchored"
                    else f"_{args.norm_method}norm")
            print(json.dumps({
                "metric": f"inference_fps_nyu_stage{args.stages}_128{qtag}{ntag}",
                "value": 0.0,
                "unit": "frames/sec/chip",
                "vs_baseline": 0.0,
                "error": f"tpu_tunnel_down: backend init probe failed for "
                         f"{args.tunnel_wait}s ({attempt} attempts); see "
                         f"CLAUDE.md 'TPU tunnel outages' and PERF.md for "
                         f"the last healthy-chip measurements",
            }), flush=True)
            sys.exit(0)
        time.sleep(min(30, max(1, deadline - time.time())))


def _summarize_deltas(deltas):
    """Robust estimate from subtraction-based timing deltas.

    Non-positive deltas are measurement corruption (the scan-1 window
    absorbed more tunnel/fetch overhead than the scan-N window — the
    BENCH_r03 -7,655.9 fps failure mode), never physics: reject them,
    report the MEDIAN of the positive samples, and surface window quality
    as ``samples`` (positive count), ``rejected`` and ``spread_pct``
    (max-min over median of the positive samples).
    """
    pos = sorted(d for d in deltas if d > 0)
    if not pos:
        raise RuntimeError(
            f"no positive timing samples in {len(deltas)} tries — window "
            f"too noisy to estimate (deltas: {[round(d, 6) for d in deltas]})")
    med = statistics.median(pos)
    quality = {
        "samples": len(pos),
        "spread_pct": round(100.0 * (pos[-1] - pos[0]) / med, 1),
    }
    if len(pos) < len(deltas):
        quality["rejected"] = len(deltas) - len(pos)
    return med, quality


def _interleaved_estimate(samplers, repeat, min_positive=3):
    """Run the delta samplers round-robin (A, B, A, B, ...) so every metric
    shares window conditions; per sampler, keep sampling (bounded at
    3x repeat rounds) until >=min_positive positive deltas, then return
    [(median_per_iter_seconds, quality_dict), ...] in sampler order.

    Per-sampler failures are ISOLATED (round-4 advisor finding): an
    exception raised while SAMPLING one metric (tunnel error mid-run), or
    an all-negative bucket, yields ``(None, {"error": msg})`` for that
    sampler only — the other buckets keep sampling and summarize normally,
    so a serving-side failure can never lose the headline estimate. If the
    failing sampler had ALREADY banked >= min_positive positive deltas,
    the estimate is salvaged from them and the exception is surfaced as
    ``sampler_error`` in its quality dict instead of discarding the
    measurement the isolation exists to protect.
    """
    min_positive = min(min_positive, repeat)
    buckets = [[] for _ in samplers]
    errors = [None] * len(samplers)
    for rounds in range(1, 3 * repeat + 1):
        for i, (sampler, bucket) in enumerate(zip(samplers, buckets)):
            if errors[i] is not None:
                continue  # dead sampler; keep the others in-window
            try:
                bucket.append(sampler())
            except Exception as e:  # noqa: BLE001 — isolate per sampler
                errors[i] = f"{type(e).__name__}: {e}"[:200]
        if rounds >= repeat and all(
            err is not None or sum(1 for d in b if d > 0) >= min_positive
            for err, b in zip(errors, buckets)
        ):
            break
    out = []
    for err, bucket in zip(errors, buckets):
        if err is not None and sum(1 for d in bucket if d > 0) < min_positive:
            out.append((None, {"error": err}))
            continue
        try:
            med, quality = _summarize_deltas(bucket)
        except RuntimeError as e:
            out.append((None, {"error": str(e)[:200]}))
            continue
        if err is not None:
            quality = dict(quality, sampler_error=err)
        out.append((med, quality))
    return out


def _make_forward_sampler(forward, variables, img, label, mask, iters):
    """Build (and compile) the in-jit lax.scan timing pair for ``forward``
    (see module docstring); returns a zero-arg callable producing one
    (T(scan N) - T(scan 1)) / (N - 1) per-iteration delta, normalized to
    seconds per scan iteration (divide batch size by it for fps)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make_scan(n):
        @jax.jit
        def run(variables, img, label, mask):
            def body(acc, i):
                # per-iteration input perturbation: the body cannot be hoisted
                out = forward(
                    variables, img + i.astype(jnp.float32) * 1e-6, label, mask
                )[-1][2]
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return acc
        return run

    run_n = make_scan(iters)
    run_1 = make_scan(1)

    def timed(fn):
        t0 = time.perf_counter()
        float(fn(variables, img, label, mask))  # scalar fetch = sync
        return time.perf_counter() - t0

    timed(run_1)  # compile
    timed(run_n)  # compile

    def sample():
        t1 = timed(run_1)
        tn = timed(run_n)
        return (tn - t1) / (iters - 1)

    return sample


def _make_serving_sampler(args):
    """Fastest supported serving config (PERF.md: batch norm folds to a
    constant affine at inference, which unblocks int8 conv chaining on the
    v5e's 394-TOPs int8 MXU): same sampler shape as the headline so the
    two can interleave."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixelwiseregression_tpu.models import PixelwiseRegression

    model = PixelwiseRegression(
        joints=args.joints, stage=args.stages, label_size=64,
        features=args.features, level=args.level,
        norm_method="batch", heatmap_method="softmax",
        decoder="xla", dtype=jnp.bfloat16, quant="int8_static_all",
    )
    b = args.batch_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, 128, 128, 1), jnp.float32)
    label = jnp.asarray(rng.rand(b, 64, 64, 1), jnp.float32)
    mask = jnp.asarray((rng.rand(b, 64, 64, 1) > 0.3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img[:1], label[:1], mask[:1],
                           train=False)
    _, upd = model.apply(variables, img, label, mask, train=False,
                         mutable=["quant_scales"])
    variables = dict(variables, **upd)
    forward = lambda v, im, la, ma: model.apply(v, im, la, ma, train=False)
    return _make_forward_sampler(forward, variables, img, label, mask,
                                 args.iters)


def _chip_health_tflops(jax, jnp, lax, np):
    """Fixed bf16 matmul-loop probe (tools/chip_health.py): effective
    TFLOP/s on [256,2048]x[2048,2048] chained 2000x inside one jit."""
    x = jnp.asarray(np.random.RandomState(0).randn(256, 2048), jnp.bfloat16)
    w = jnp.asarray(np.random.RandomState(1).randn(2048, 2048), jnp.bfloat16)

    @jax.jit
    def run(x, w):
        def body(acc, _):
            return (acc @ w).astype(jnp.bfloat16), None
        y, _ = lax.scan(body, x, None, length=2000)
        return jnp.sum(y.astype(jnp.float32))

    float(run(x, w))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(x, w))
        best = min(best, time.perf_counter() - t0)
    return round(2 * 256 * 2048 * 2048 * 2000 / best / 1e12, 1)


def bench_train(args):
    """Train-step throughput (the reference hot loop being beaten:
    train.py:156-211): raw NYU-shaped 480x640 frames on device, fused
    preprocess (augmentation on) + 2-stage fwd/bwd + AdamW, bf16.

    Same in-jit lax.scan timing as inference: the state threads through the
    scan (so buffers donate exactly as in training), the raw batch is
    perturbed per iteration so the body cannot be hoisted.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pixelwiseregression_tpu.data.preprocess import PreprocessConfig
    from pixelwiseregression_tpu.models import PixelwiseRegression
    from pixelwiseregression_tpu.train.loop import (
        LossConfig, create_train_state, make_optimizer, make_train_step,
    )
    from pixelwiseregression_tpu.utils.synth import make_synthetic_raw_batch

    b = args.train_batch_size
    # NYU intrinsics/shape (reference: datasets.py:693-696)
    fx, fy, fh, fw = 588.03, 587.07, 480, 640
    cfg = PreprocessConfig(
        fx=fx, fy=fy, halfu=fw / 2, halfv=fh / 2,
        image_size=128, label_size=64, kernel_size=7, sigma=1.5,
        using_rotation=True, using_scale=True, using_shift=True,
    )
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    # match the training CLI's decoder default (pallas — its fused custom
    # backward is the point; args.decoder only governs the inference bench)
    train_decoder = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    model = PixelwiseRegression(
        joints=args.joints, stage=2, label_size=64, features=args.features,
        level=args.level, norm_method=args.norm_method, dtype=dtype,
        decoder=train_decoder,
    )
    tx = make_optimizer(steps_per_epoch=100)
    sample = (
        jnp.zeros((2, 128, 128, 1)), jnp.zeros((2, 64, 64, 1)),
        jnp.zeros((2, 64, 64, 1)),
    )
    state = create_train_state(model, jax.random.PRNGKey(0), sample, tx)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_raw_batch(b, fh, fw, args.joints, fx=fx, fy=fy).items()}
    raw_step = make_train_step(cfg, LossConfig(), augment=True, jit=False)

    def make_scan(n):
        @jax.jit
        def run(state, batch):
            def body(carry, i):
                st = carry
                b2 = dict(batch)
                b2["frame"] = batch["frame"] + i.astype(jnp.float32) * 1e-3
                st, metrics = raw_step(st, b2, jax.random.fold_in(jax.random.PRNGKey(1), i))
                return st, metrics["loss"]
            st, losses = lax.scan(body, state, jnp.arange(n))
            return losses[-1]
        return run

    run_n, run_1 = make_scan(6), make_scan(1)
    for f in (run_1, run_n):
        float(f(state, batch))

    def sample():
        t0 = time.perf_counter(); float(run_1(state, batch))
        t1 = time.perf_counter(); float(run_n(state, batch))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (6 - 1)

    # The train line is the noisiest driver-facing metric (BENCH_r04:
    # spread_pct 10.2 on 4 samples brackets 1,170-1,430 f/s — too wide to
    # detect a ~10% step win). Collect >=6 positive samples and bracket
    # the window with the chip-health probe so a drifting chip is visible
    # in the record itself.
    health_pre = (_chip_health_tflops(jax, jnp, lax, np)
                  if jax.devices()[0].platform == "tpu" else None)
    (dt, quality), = _interleaved_estimate(
        [sample], max(args.repeat, 6), min_positive=6)
    health_post = (_chip_health_tflops(jax, jnp, lax, np)
                   if jax.devices()[0].platform == "tpu" else None)
    if dt is None:
        raise RuntimeError(f"train estimate failed: {quality['error']}")
    if health_pre is not None:
        quality = dict(quality, chip_health_tflops_pre=health_pre,
                       chip_health_tflops_post=health_post)
    return {
        "train_fps": round(b / dt, 1),
        "train_ms_per_step": round(dt * 1e3, 2),
        "train_batch_size": b,
        "quality": quality,
    }


if __name__ == "__main__":
    main()
