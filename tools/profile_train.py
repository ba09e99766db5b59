"""Profile the fused train step on the real TPU: per-op us/frame table.

Same setup as bench.py's train measurement (raw 480x640 frames, fused
preprocess+aug, 2-stage fwd/bwd, AdamW) — relative breakdown stays valid
even when the shared chip is degraded (uniform slowdown)."""

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--level", type=int, default=4)
    p.add_argument("--stages", type=int, default=2)
    p.add_argument("--joints", type=int, default=14)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--top", type=int, default=45)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pixelwiseregression_tpu.data.preprocess import PreprocessConfig
    from pixelwiseregression_tpu.models import PixelwiseRegression
    from pixelwiseregression_tpu.train.loop import (
        LossConfig, create_train_state, make_optimizer, make_train_step,
    )
    from pixelwiseregression_tpu.utils.synth import make_synthetic_raw_batch

    b = args.batch_size
    fx, fy, fh, fw = 588.03, 587.07, 480, 640
    cfg = PreprocessConfig(
        fx=fx, fy=fy, halfu=fw / 2, halfv=fh / 2,
        image_size=128, label_size=64, kernel_size=7, sigma=1.5,
        using_rotation=True, using_scale=True, using_shift=True,
    )
    model = PixelwiseRegression(
        joints=args.joints, stage=args.stages, label_size=64,
        features=args.features, level=args.level, norm_method="instance",
        dtype=jnp.bfloat16,
        # training CLI default: pallas decoder (fused custom backward)
        decoder="pallas" if jax.devices()[0].platform == "tpu" else "xla",
    )
    tx = make_optimizer(steps_per_epoch=100)
    sample = (jnp.zeros((2, 128, 128, 1)), jnp.zeros((2, 64, 64, 1)),
              jnp.zeros((2, 64, 64, 1)))
    state = create_train_state(model, jax.random.PRNGKey(0), sample, tx)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_raw_batch(b, fh, fw, args.joints, fx=fx, fy=fy).items()}
    raw_step = make_train_step(cfg, LossConfig(), augment=True, jit=False)

    @jax.jit
    def run(state, batch):
        def body(carry, i):
            st = carry
            b2 = dict(batch)
            b2["frame"] = batch["frame"] + i.astype(jnp.float32) * 1e-3
            st, metrics = raw_step(st, b2, jax.random.fold_in(jax.random.PRNGKey(1), i))
            return st, metrics["loss"]
        st, losses = lax.scan(body, state, jnp.arange(args.iters))
        return losses[-1]

    float(run(state, batch))  # compile + warm
    tdir = tempfile.mkdtemp(prefix="pwr_trainprof_")
    jax.profiler.start_trace(tdir)
    float(run(state, batch))
    jax.profiler.stop_trace()

    files = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True)
    assert files, f"no trace under {tdir}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name or "/device" in name}
    per_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if "XLA Op" not in tid_names.get((e["pid"], e["tid"]), ""):
            continue
        name = e.get("name", "?")
        if name.startswith("while"):
            continue  # scan wrapper double-counts its children
        per_op[name] += e.get("dur", 0)
        total += e.get("dur", 0)
    frames = b * args.iters
    print(f"total device op time {total/1e3:.1f} ms for {frames} frames = "
          f"{total/frames:.1f} us/frame ({total/args.iters/1e3:.2f} ms/step)")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{dur/frames:8.2f} us/frame  {100*dur/total:5.1f}%  {name[:110]}")
    shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
