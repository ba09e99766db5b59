"""Map profiled fusion names to their HLO bodies for the flagship forward.

Compiles the same jitted scan as tools/profile_infer.py and prints, for each
requested fusion name (e.g. fusion.1597), a compact summary of the ops it
contains (convs with shapes, reduces, transposes) so profile rows can be
attributed to model components.

Usage: python tools/map_fusions.py fusion.1597 fusion.1638 ...
       python tools/map_fusions.py --all-convs   # every conv with its fusion
"""

import argparse
import re
import sys

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="*", help="fusion instruction names")
    p.add_argument("--all-convs", action="store_true")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--stages", type=int, default=2)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--level", type=int, default=4)
    p.add_argument("--joints", type=int, default=14)
    p.add_argument("--dtype", type=str, default="bf16")
    p.add_argument("--decoder", type=str, default="pallas")
    p.add_argument("--norm_method", type=str, default="instance_anchored")
    p.add_argument("--iters", type=int, default=8)
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

    # index: computation name -> its body lines
    comps = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"^\s*%?([\w.\-]+)\s*(\([^)]*\))?\s*->.*{?\s*$", line)
        if line.lstrip().startswith(("fused_computation", "%fused_computation",
                                     "ENTRY", "while_body", "region_")):
            pass
        mdef = re.match(r"^(%[\w.\-]+|[\w.\-]+)\s+\(", line)
        if mdef and line.rstrip().endswith("{"):
            cur = mdef.group(1).lstrip("%")
            comps[cur] = []
        elif cur is not None:
            if line.strip() == "}":
                cur = None
            else:
                comps[cur].append(line.strip())

    # find fusion instructions anywhere, map name -> called computation
    fusion_to_comp = {}
    fusion_meta = {}
    for line in hlo.splitlines():
        m = re.search(r"(%?)([\w.\-]*fusion[\w.\-]*)\s*=\s*(\S+)\s+fusion\(.*calls=%?([\w.\-]+)", line)
        if m:
            fusion_to_comp[m.group(2)] = m.group(4)
            fusion_meta[m.group(2)] = m.group(3)

    interesting = re.compile(
        r"convolution|reduce\(|reduce-window|transpose|dot\(|custom-call|copy\(")

    def summarize(fname):
        comp = fusion_to_comp.get(fname)
        print(f"== {fname} -> {comp}  out={fusion_meta.get(fname, '?')}")
        if comp is None or comp not in comps:
            # maybe it's a standalone op, grep directly
            for line in hlo.splitlines():
                if re.search(rf"%?{re.escape(fname)}\s*=", line):
                    print("   " + line.strip()[:300])
            return
        body = comps[comp]
        n_other = 0
        for line in body:
            if interesting.search(line):
                print("   " + line[:260])
            else:
                n_other += 1
        print(f"   (+{n_other} elementwise/other ops)")

    if args.all_convs:
        for line in hlo.splitlines():
            if "convolution(" in line or "convolution-base-dilated" in line:
                print(line.strip()[:260])
        return

    for fname in args.names:
        summarize(fname)


if __name__ == "__main__":
    main()
