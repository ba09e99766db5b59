"""A/B the instance-norm variance forms on the stage-1 headline config.

Run on a HEALTHY chip (the axon tunnel is sometimes contended — sanity: the
f32 one-pass variant should reproduce ~10.3k fps from round 1; if it does
not, discard the whole run). One process, same inputs, all variants timed
with the in-jit lax.scan methodology so the comparison is apples-to-apples.

Variants:
  onepass   var = E[x^2] - E[x]^2          (round-1 fast form; cancels on
                                            near-constant channels)
  twopass   var = E[(x-mean)^2]            (torch semantics; extra read)
  anchored  var = E[(x-c)^2] - E[x-c]^2    (c = x[:,0,0,:]; robust + one pass)
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

    import pixelwiseregression_tpu.models.layers as L
    from pixelwiseregression_tpu.models import PixelwiseRegression

    def fwd_onepass(x32, scale, bias, eps):
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        mean_sq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + eps)
        a = inv * scale
        b = bias - mean * a
        return x32 * a + b, (x32, mean, inv, scale)

    def fwd_twopass(x32, scale, bias, eps):
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        a = inv * scale
        b = bias - mean * a
        return x32 * a + b, (x32, mean, inv, scale)

    def fwd_anchored(x32, scale, bias, eps):
        c = x32[:, :1, :1, :]
        xc = x32 - c
        m1 = jnp.mean(xc, axis=(1, 2), keepdims=True)
        m2 = jnp.mean(jnp.square(xc), axis=(1, 2), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(m1), 0.0)
        mean = c + m1
        inv = jax.lax.rsqrt(var + eps)
        a = inv * scale
        b = bias - mean * a
        return x32 * a + b, (x32, mean, inv, scale)

    b = args.batch_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, 128, 128, 1), jnp.float32)
    label = jnp.asarray(rng.rand(b, 64, 64, 1), jnp.float32)
    mask = jnp.asarray((rng.rand(b, 64, 64, 1) > 0.3), jnp.float32)

    model = PixelwiseRegression(
        joints=14, stage=args.stages, label_size=64, features=128, level=4,
        norm_method="instance", heatmap_method="softmax", decoder="xla",
        dtype=jnp.bfloat16,
    )
    variables = model.init(jax.random.PRNGKey(0), img[:1], label[:1], mask[:1],
                           train=False)

    def measure(tag):
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
        print(f"{tag}: {b / best:.0f} fps  ({best / b * 1e6:.1f} us/frame)",
              flush=True)

    for tag, fwd in [("onepass", fwd_onepass), ("twopass", fwd_twopass),
                     ("anchored", fwd_anchored)]:
        L._instance_norm.defvjp(fwd, L._instance_norm_bwd)
        measure(tag)
    # restore the in-tree definition
    L._instance_norm.defvjp(L._instance_norm_fwd, L._instance_norm_bwd)


if __name__ == "__main__":
    main()
