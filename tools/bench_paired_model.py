"""Full-model A/B of the paired-heads inference path (ONE process).

Builds each variant as a first-class model config (never patches) and times
the flagship forward with the in-jit lax.scan methodology. Default compares
stage-1 (the headline config) and stage-2 (the flagship) with pairing
off/on and the mid/final strategy grid.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--level", type=int, default=4)
    p.add_argument("--joints", type=int, default=14)
    p.add_argument("--stages", type=int, default=None,
                   help="restrict to one stage count (default: 1 and 2)")
    p.add_argument("--norm_method", type=str, default="instance_anchored")
    p.add_argument("--decoder", type=str, default="pallas")
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--repeat", type=int, default=3)
    p.add_argument("--full_grid", action="store_true",
                   help="also run grouped/separate strategy variants")
    p.add_argument("--twice", action="store_true",
                   help="run the variant list forward then reversed (guards "
                        "an A/B verdict against within-window chip drift)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from pixelwiseregression_tpu.models import PixelwiseRegression

    b = args.batch_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, 128, 128, 1), jnp.float32)
    label = jnp.asarray(rng.rand(b, 64, 64, 1), jnp.float32)
    mask = jnp.asarray((rng.rand(b, 64, 64, 1) > 0.3), jnp.float32)

    variants = [("off", dict(paired_heads=False)),
                ("sep/separate", dict(paired_heads=True,
                                      paired_mid="separate",
                                      paired_final="separate"))]
    if args.full_grid:
        variants += [
            ("sep/blockdiag", dict(paired_heads=True, paired_mid="separate",
                                   paired_final="blockdiag")),
            ("grp/blockdiag", dict(paired_heads=True, paired_mid="grouped",
                                   paired_final="blockdiag")),
            ("grp/separate", dict(paired_heads=True, paired_mid="grouped",
                                  paired_final="separate")),
        ]

    if args.twice:
        variants = variants + variants[::-1]
    stage_list = [args.stages] if args.stages else [1, 2]
    variables = None
    for stages in stage_list:
        for name, kw in variants:
            model = PixelwiseRegression(
                joints=args.joints, stage=stages, label_size=64,
                features=args.features, level=args.level,
                norm_method=args.norm_method, heatmap_method="softmax",
                decoder=args.decoder, dtype=jnp.bfloat16, **kw)
            if name == "off" or variables is None:
                variables = model.init(jax.random.PRNGKey(0), img[:1],
                                       label[:1], mask[:1], train=False)

            def make(n, model=model, variables=variables):
                @jax.jit
                def run(img, label, mask):
                    def body(acc, i):
                        out = model.apply(
                            variables,
                            img + i.astype(jnp.float32) * 1e-6,
                            label, mask, train=False)[-1][2]
                        return acc + jnp.sum(out.astype(jnp.float32)), None
                    acc, _ = lax.scan(body, jnp.float32(0.0),
                                      jnp.arange(n))
                    return acc
                return run

            rn, r1 = make(args.iters), make(1)

            def timed(r):
                t0 = time.perf_counter()
                float(r(img, label, mask))
                return time.perf_counter() - t0

            timed(r1); timed(rn)
            best = min((timed(rn) - timed(r1)) / (args.iters - 1)
                       for _ in range(args.repeat))
            fps = b / best
            print(f"stage={stages} paired={name:14s} "
                  f"{best * 1e6 / b:7.2f} us/frame = {fps:8.1f} fps",
                  flush=True)


if __name__ == "__main__":
    main()
