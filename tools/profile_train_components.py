"""Per-component device-time breakdown of the fused TRAIN step on the TPU.

Same fused step as bench.py's train line (raw 480x640 frames, on-device
preprocess+aug, fwd/bwd, AdamW), with each profiled op attributed to its
model component via HLO op_name metadata — and split fwd vs bwd (backward
ops carry ``transpose(jvp(...))`` in their path). This is the tool that
decides where training optimization goes (VERDICT round-2 item 2: the
train-step profile was previously known only to be "flat").
"""

import argparse
import glob
import gzip
import json
import os
import re
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
    p.add_argument("--norm_method", type=str, default="instance_anchored")
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--top", type=int, default=50)
    args = p.parse_args()

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
        features=args.features, level=args.level,
        norm_method=args.norm_method, dtype=jnp.bfloat16,
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

    compiled = run.lower(state, batch).compile()
    hlo = compiled.as_text()

    name_to_path = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%([\w.\-]+)\s*=", line)
        if not m:
            continue
        mm = re.search(r'op_name="([^"]+)"', line)
        if mm:
            name_to_path[m.group(1)] = mm.group(1)

    def component(opname):
        path = name_to_path.get(opname)
        if path is None:
            return f"<unattributed:{opname.split('.')[0]}>"
        direction = "bwd" if ("transpose(" in path or "vjp" in path.lower()) \
            else "fwd"
        parts = path.split("/")
        model_part = None
        for i, piece in enumerate(parts):
            if "PixelwiseRegression" in piece:
                model_part = parts[i + 1:]
                break
        if model_part is None:
            # outside the model: preprocess, loss, optimizer, decoder glue
            tail = [s for s in parts if not s.startswith(("jit(", "while",
                                                          "body", "cond"))]
            label = "/".join(tail[-2:]) if tail else path
            return f"<non-model> {label[:60]}"
        comp = "/".join(model_part[: args.depth]) or "<model-root>"
        return f"[{direction}] {comp}"

    float(run(state, batch))  # compile + warm
    tdir = tempfile.mkdtemp(prefix="pwr_traincomp_")
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

    per_comp = defaultdict(float)
    per_comp_ops = defaultdict(int)
    total = 0.0
    fwd_total = bwd_total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if "XLA Op" not in tid_names.get((e["pid"], e["tid"]), ""):
            continue
        name = e.get("name", "?")
        if name.startswith("while"):
            continue
        dur = e.get("dur", 0)
        comp = component(name)
        per_comp[comp] += dur
        per_comp_ops[comp] += 1
        total += dur
        if comp.startswith("[fwd]"):
            fwd_total += dur
        elif comp.startswith("[bwd]"):
            bwd_total += dur

    frames = b * args.iters
    print(f"total device op time {total/1e3:.1f} ms for {frames} frames = "
          f"{total/frames:.1f} us/frame ({total/args.iters/1e3:.2f} ms/step)")
    other = total - fwd_total - bwd_total
    print(f"  model fwd {fwd_total/frames:7.1f} us/frame ({100*fwd_total/total:.1f}%)   "
          f"model bwd {bwd_total/frames:7.1f} ({100*bwd_total/total:.1f}%)   "
          f"non-model {other/frames:7.1f} ({100*other/total:.1f}%)")
    for comp, dur in sorted(per_comp.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {dur/frames:7.2f} us/frame {100*dur/total:5.1f}%  "
              f"({per_comp_ops[comp]:4d} ops)  {comp}")
    shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
