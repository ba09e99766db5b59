"""Order-controlled A/B of XLA compiler-knob variants (train or infer step).

Three ways to express a variant:

  NAME=--xla_flag=...            client-side XLA_FLAGS (process-global,
                                 read at backend init)
  NAME=arg:key=value[,k2=v2]     per-variant WORKLOAD args (batch, iters,
                                 norm_method, decoder, stages, ...) —
                                 turns the harness into a general
                                 order-controlled config A/B (e.g. a
                                 batch-size sweep: --variant b256= \
                                 --variant b512=arg:batch=512). Compare
                                 the per-round f/s, not ms, when batch
                                 differs.
  NAME=copt:key=value[,k2=v2]    per-jit ``compiler_options`` — forwarded
                                 to the SERVER-side TPU compiler as
                                 env_option_overrides. This is the ONLY
                                 route for ``xla_tpu_*`` knobs here: the
                                 axon PJRT plugin's client flag parser
                                 aborts on them in XLA_FLAGS (measured
                                 2026-08-18: "Unknown flag in XLA_FLAGS"),
                                 while the remote-compile path accepts
                                 them (and rejects bogus names with an
                                 HTTP 500, so acceptance is validation).

The target: the train step's gap to its ~42 ms SoL is flat conv-backward
MXU inefficiency (PERF.md round-3 train audit) — compiler-level knobs
(scoped VMEM budget, scheduler choices) are the remaining lever XLA
exposes. Every measurement runs in its OWN subprocess (uniform for both
variant kinds: cache-namespace hygiene + isolation from a wedged tunnel);
the parent interleaves variants A,B,...,A,B,... across rounds (the
window-drift discipline that caught the phantom paired-heads win —
PERF.md) and reports per-variant mins/medians. Typical sweep:

    python tools/xla_flags_ab.py --workload train \\
        --variant base= \\
        --variant vmem128=copt:xla_tpu_scoped_vmem_limit_kib=131072 \\
        --rounds 3

Each variant's measurement uses the same in-jit lax.scan methodology as
bench.py/train_ab.py (naive host timing lies through the axon tunnel).
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _child(args):
    # honor PWR_PLATFORM before any backend init: a dead tunnel otherwise
    # blocks the child forever (CLAUDE.md "TPU tunnel outages")
    from pixelwiseregression_tpu.cli.common import apply_platform_override

    apply_platform_override()
    copts = _parse_copts(args.copts) if args.copts else None
    if args.workload == "train":
        from tools.train_ab import measure

        ms, fps = measure(args.norm_method, args.batch, args.iters,
                          args.repeat, args.decoder, compiler_options=copts)
    else:
        ms, fps = _measure_infer(args, copts)
    print(json.dumps({"ms": ms, "fps": fps}), flush=True)


def _parse_copts(spec: str) -> dict:
    """'k=v,k2=v2' -> {'k': 'v', 'k2': 'v2'} (values stay strings; the
    server-side flag parser does the typing)."""
    out = {}
    for pair in spec.split(","):
        k, sep, v = pair.partition("=")
        if not sep or not k:
            raise SystemExit(f"bad compiler-option pair {pair!r} in {spec!r}")
        out[k] = v
    return out


def _measure_infer(args, compiler_options=None):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pixelwiseregression_tpu.models import PixelwiseRegression

    ls = args.label_size
    model = PixelwiseRegression(
        joints=14, stage=args.stages, label_size=ls,
        features=args.features, level=args.level,
        norm_method=args.norm_method, dtype=jnp.bfloat16,
        decoder=args.decoder, quant=(args.quant or None),
    )
    b = args.batch
    img = jnp.zeros((b, 2 * ls, 2 * ls, 1), jnp.float32)
    label = jnp.zeros((b, ls, ls, 1), jnp.float32)
    mask = jnp.ones((b, ls, ls, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img[:1], label[:1],
                           mask[:1], train=False)
    if args.quant and "static" in args.quant:
        # calibrate the static activation scales with one mutable pass
        # (same recipe as bench._bench_serving_config)
        _, upd = model.apply(variables, img, label, mask, train=False,
                             mutable=["quant_scales"])
        variables = dict(variables, **upd)

    def make_scan(n):
        # label/mask must be ARGUMENTS: a closure capture bakes them into
        # the executable as constants, and at batch>=512 the constant
        # materialization alone RESOURCE_EXHAUSTs the TPU backend during
        # lowering (observed 2026-08-18 queue window).
        def run(variables, img, label, mask):
            def body(carry, i):
                out = model.apply(variables, img + i * 1e-6, label, mask,
                                  train=False)
                return carry, out[-1][2].astype(jnp.float32).sum()
            _, s = lax.scan(body, 0.0, jnp.arange(n, dtype=jnp.float32))
            return s[-1]
        return jax.jit(run, compiler_options=compiler_options)

    run_n, run_1 = make_scan(args.iters), make_scan(1)
    for f in (run_1, run_n):
        float(f(variables, img, label, mask))
    per = []
    for _ in range(args.repeat):
        t0 = time.perf_counter(); float(run_1(variables, img, label, mask))
        t1 = time.perf_counter(); float(run_n(variables, img, label, mask))
        t2 = time.perf_counter()
        per.append(((t2 - t1) - (t1 - t0)) / (args.iters - 1))
    dt = min(per)
    return dt * 1e3, b / dt


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workload", choices=["train", "infer"], default="train")
    ap.add_argument("--variant", action="append", default=[],
                    help="NAME=XLA_FLAGS (empty flags = baseline); "
                         "repeatable, measured interleaved")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--stages", type=int, default=2)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--level", type=int, default=4)
    ap.add_argument("--label_size", type=int, default=64)
    ap.add_argument("--norm_method", default="instance_anchored")
    ap.add_argument("--decoder", default="xla")
    ap.add_argument("--quant", default="",
                    help="infer workload only: int8[_static][_all|_heads] "
                         "(static scales calibrated with one mutable pass)")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-subprocess bound (compile + measure; cold "
                         "train-step compiles on a 1-core host run ~10 min)")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--copts", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        return _child(args)

    variants = []
    for v in args.variant or ["base="]:
        name, _, flags = v.partition("=")
        variants.append((name, flags))
    if len(variants) < 2:
        print("# single variant: measuring it alone (no A/B)", file=sys.stderr)

    results = {name: [] for name, _ in variants}
    child_args = {"workload": args.workload, "batch": args.batch,
                  "iters": args.iters, "repeat": args.repeat,
                  "stages": args.stages, "decoder": args.decoder,
                  "features": args.features, "level": args.level,
                  "label_size": args.label_size,
                  "norm_method": args.norm_method, "quant": args.quant}
    for r in range(args.rounds):
        for name, flags in variants:
            env = dict(os.environ)
            ca = dict(child_args)
            copts = None
            if flags.startswith("copt:"):
                copts = flags[len("copt:"):]
            elif flags.startswith("arg:"):
                for k, v in _parse_copts(flags[len("arg:"):]).items():
                    if k not in ca:
                        raise SystemExit(f"unknown workload arg {k!r} in "
                                         f"variant {name!r} (valid: "
                                         f"{sorted(ca)})")
                    ca[k] = v
            elif flags:
                env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
            cmd = [sys.executable, os.path.abspath(__file__), "--child"]
            for k, v in ca.items():
                cmd += [f"--{k}", str(v)]
            if copts:
                cmd += ["--copts", copts]
            # each child gets its own cache namespace: entries compiled with
            # different XLA flags must not shadow each other
            env["PWR_COMPILE_CACHE_DIR"] = os.path.expanduser(
                f"~/.cache/pixelwiseregression_tpu/xla_ab_{name or 'base'}")
            try:
                out = subprocess.run(cmd, env=env, timeout=args.timeout,
                                     capture_output=True, text=True, check=True)
                rec = json.loads(out.stdout.strip().splitlines()[-1])
            except subprocess.CalledProcessError as e:
                print(f"round {r} {name}: FAILED\n{e.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            except subprocess.TimeoutExpired:
                print(f"round {r} {name}: TIMEOUT {args.timeout}s",
                      file=sys.stderr)
                continue
            results[name].append((rec["ms"], rec["fps"]))
            print(f"round {r} {name}: {rec['ms']:.2f} ms "
                  f"({rec['fps']:.1f} f/s)", flush=True)

    print()
    for name, flags in variants:
        recs = results[name]
        if not recs:
            print(f"{name:>12}: no successful runs")
            continue
        ms = [m for m, _ in recs]
        fps = [f for _, f in recs]
        print(f"{name:>12}: min {min(ms):.2f} ms  "
              f"median {statistics.median(ms):.2f} ms  "
              f"best {max(fps):.1f} f/s  n={len(ms)}  "
              f"[{flags or 'baseline'}]")


if __name__ == "__main__":
    main()
