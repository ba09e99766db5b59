"""Per-component device-time breakdown of flagship inference on the TPU.

Same jitted scan as tools/profile_infer.py, but each profiled op is
attributed to its model component via the HLO metadata op_name path
(e.g. ``.../stage_0/hourglass/res_down_2/Conv_1/...``), so time aggregates
to meaningful units (stem, per-stage hourglass by level, heads, decoder)
instead of anonymous fusion numbers. This is the tool that decides where
stage-2 optimization effort goes (PERF.md round-3).
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--stages", type=int, default=2)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--level", type=int, default=4)
    p.add_argument("--joints", type=int, default=14)
    p.add_argument("--dtype", type=str, default="bf16")
    p.add_argument("--decoder", type=str, default="pallas")
    p.add_argument("--norm_method", type=str, default="instance_anchored")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--depth", type=int, default=3,
                   help="component path depth to aggregate at")
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
        decoder=args.decoder, dtype=dtype,
    )
    b = args.batch_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, 128, 128, 1), jnp.float32)
    label = jnp.asarray(rng.rand(b, 64, 64, 1), jnp.float32)
    mask = jnp.asarray((rng.rand(b, 64, 64, 1) > 0.3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img[:1], label[:1],
                           mask[:1], train=False)

    @jax.jit
    def run(variables, img, label, mask):
        def body(acc, i):
            out = model.apply(variables, img + i.astype(jnp.float32) * 1e-6,
                              label, mask, train=False)[-1][2]
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(args.iters))
        return acc

    compiled = run.lower(variables, img, label, mask).compile()
    hlo = compiled.as_text()

    # op instruction name -> metadata op_name path
    name_to_path = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%([\w.\-]+)\s*=", line)
        if not m:
            continue
        mm = re.search(r'op_name="([^"]+)"', line)
        if mm:
            name_to_path[m.group(1)] = mm.group(1)

    float(run(variables, img, label, mask))  # warm
    tdir = tempfile.mkdtemp(prefix="pwr_comp_")
    jax.profiler.start_trace(tdir)
    float(run(variables, img, label, mask))
    jax.profiler.stop_trace()

    files = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace written under {tdir}"
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

    def component(opname):
        path = name_to_path.get(opname)
        if path is None:
            return f"<unattributed:{opname.split('.')[0]}>"
        # strip the jit(run)/while/body/... prefix down to the model part
        parts = path.split("/")
        try:
            i = parts.index("PixelwiseRegression")
            parts = parts[i + 1:]
        except ValueError:
            return "<outside-model>"
        return "/".join(parts[: args.depth]) or "<model-root>"

    per_comp = defaultdict(float)
    per_comp_ops = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "XLA Op" not in tname:
            continue
        name = e.get("name", "?")
        if name.startswith("while"):
            continue  # the outer scan op double-counts its body
        dur = e.get("dur", 0)
        comp = component(name)
        per_comp[comp] += dur
        per_comp_ops[comp] += 1
        total += dur

    frames = b * args.iters
    print(f"total (excl. outer while): {total / 1e3:.2f} ms "
          f"=> {total / frames:.1f} us/frame")
    rows = sorted(per_comp.items(), key=lambda kv: -kv[1])[: args.top]
    for comp, dur in rows:
        print(f"  {dur / frames:7.2f} us/frame {100 * dur / total:5.1f}%  "
              f"({per_comp_ops[comp]:3d} ops)  {comp}")


if __name__ == "__main__":
    main()
