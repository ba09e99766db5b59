"""Profile flagship inference on the real TPU and print a per-op time table.

Usage: python tools/profile_infer.py [--stages 2] [--batch_size 256] ...
Captures a jax.profiler trace of a few jitted scan iterations and summarizes
device-side op durations grouped by fusion/op name, so optimization work
targets measured time, not FLOP guesses (PERF.md methodology).
"""

import argparse
import glob
import sys

sys.path.insert(0, "/root/repo")
import gzip
import json
import os
import shutil
import tempfile
from collections import defaultdict


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--stages", type=int, default=2)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--level", type=int, default=4)
    p.add_argument("--joints", type=int, default=14)
    p.add_argument("--dtype", type=str, default="bf16")
    p.add_argument("--decoder", type=str, default="xla")
    p.add_argument("--norm_method", type=str, default="instance")
    p.add_argument("--quant", type=str, default="",
                   help="int8[_static][_all|_heads] — profile the serving "
                        "quant path (static scales calibrated in one "
                        "mutable pass)")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from pixelwiseregression_tpu.models import PixelwiseRegression

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = PixelwiseRegression(
        joints=args.joints, stage=args.stages, label_size=64,
        features=args.features, level=args.level,
        norm_method=args.norm_method, heatmap_method="softmax",
        decoder=args.decoder, dtype=dtype, quant=(args.quant or None),
    )
    b = args.batch_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, 128, 128, 1), jnp.float32)
    label = jnp.asarray(rng.rand(b, 64, 64, 1), jnp.float32)
    mask = jnp.asarray((rng.rand(b, 64, 64, 1) > 0.3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img[:1], label[:1], mask[:1], train=False)
    if args.quant and "static" in args.quant:
        _, upd = model.apply(variables, img, label, mask, train=False,
                             mutable=["quant_scales"])
        variables = dict(variables, **upd)

    @jax.jit
    def run(variables, img, label, mask):
        def body(acc, i):
            out = model.apply(variables, img + i.astype(jnp.float32) * 1e-6,
                              label, mask, train=False)[-1][2]
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(args.iters))
        return acc

    float(run(variables, img, label, mask))  # compile + warm
    tdir = tempfile.mkdtemp(prefix="pwr_prof_")
    jax.profiler.start_trace(tdir)
    float(run(variables, img, label, mask))
    jax.profiler.stop_trace()

    files = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True)
    assert files, f"no trace written under {tdir}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # device op events live on TensorCore pids; host python events have
    # different pids. Identify device threads by names like "XLA Op" / TensorCore.
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name or "Device" in name or "/device" in name}
    per_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        dur = e.get("dur", 0)
        name = e.get("name", "?")
        # keep only leaf op rows (XLA Ops thread); skip module/step rows
        if "XLA Op" not in tname and "XLA TraceMe" not in tname:
            continue
        per_op[name] += dur
        total += dur

    frames = b * args.iters
    print(f"pid names: {sorted(set(pid_names.values()))}")
    print(f"thread names: {sorted(set(tid_names.values()))[:20]}")
    print(f"total device op time: {total/1e3:.2f} ms for {frames} frames "
          f"=> {total/frames:.1f} us/frame")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]
    for name, dur in rows:
        print(f"{dur/frames:8.2f} us/frame  {100*dur/total:5.1f}%  {name[:110]}")

    shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
