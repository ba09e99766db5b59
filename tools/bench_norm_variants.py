"""A/B the instance-norm statistic forms on the stage-1 headline config.

One process, same inputs, both variants built as first-class model configs
(norm_method 'instance' = two-pass torch-robust default vs 'instance_fast'
= one-pass fused stats) so the comparison is apples-to-apples.

HISTORY / why this tool exists: the first version of this script patched
``_instance_norm.defvjp(...)`` to swap variants — which does NOT change the
custom_vjp PRIMAL (it calls the module-level forward by name), so all
"variants" silently measured the same in-tree code. That bogus A/B, plus a
mis-calibrated chip-health probe, led to a night of chasing a phantom
"degraded chip". The measured truth (same-process, verified against
batch-norm configs that reproduce round-1 numbers): one-pass 10.3k fps,
two-pass 8.3k, data-anchored one-pass 6.4k (the anchor slice stops XLA from
fusing the stat reductions into the producing conv at all).
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--stages", type=int, default=1)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pixelwiseregression_tpu.models import PixelwiseRegression

    b = args.batch_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, 128, 128, 1), jnp.float32)
    label = jnp.asarray(rng.rand(b, 64, 64, 1), jnp.float32)
    mask = jnp.asarray((rng.rand(b, 64, 64, 1) > 0.3), jnp.float32)

    def measure(norm_method):
        model = PixelwiseRegression(
            joints=14, stage=args.stages, label_size=64, features=128,
            level=4, norm_method=norm_method, heatmap_method="softmax",
            decoder="xla", dtype=jnp.bfloat16,
        )
        variables = model.init(jax.random.PRNGKey(0), img[:1], label[:1],
                               mask[:1], train=False)

        def make(n):
            @jax.jit
            def run(variables, img, label, mask):
                def body(acc, i):
                    out = model.apply(variables, img + i.astype(jnp.float32) * 1e-6,
                                      label, mask, train=False)[-1][2]
                    return acc + jnp.sum(out.astype(jnp.float32)), None
                acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
                return acc
            return run

        rn, r1 = make(args.iters), make(1)
        for f in (r1, rn):
            float(f(variables, img, label, mask))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(r1(variables, img, label, mask))
            t1 = time.perf_counter(); float(rn(variables, img, label, mask))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (args.iters - 1))
        print(f"{norm_method}: {b / best:.0f} fps  ({best / b * 1e6:.1f} us/frame)",
              flush=True)

    for nm in ("instance", "instance_anchored", "instance_fast"):
        measure(nm)


if __name__ == "__main__":
    main()
