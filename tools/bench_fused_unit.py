"""A/B microbenchmark: fused Pallas conv+instance-norm units vs the XLA
two-pass path, per-shape, on the real chip.

Same in-jit lax.scan timing as bench.py (the axon tunnel makes dispatch
timing unreliable). Variants are built as first-class configs in ONE
process (PERF.md post-mortem: never patch primitives for an A/B).

Usage: python tools/bench_fused_unit.py [--batch 256] [--iters 32]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pixelwiseregression_tpu.ops.pallas_fused import fused_conv_norm


def xla_unit(x, w, b, ps=None, pb=None, es=None, eb=None, eps=1e-5):
    act = x.dtype

    def norm_relu(y, s, bb):
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(y32 - mean), axis=(1, 2), keepdims=True)
        inv = lax.rsqrt(var + eps)
        a = inv * s
        return jnp.maximum(y32 * a + (bb - mean * a), 0.0).astype(act)

    if ps is not None:
        x = norm_relu(x, ps, pb)
    k = w.shape[0]
    pad = k // 2
    y = lax.conv_general_dilated(
        x.astype(act), w.astype(act),
        window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = (y + b.astype(act)).astype(act)
    if es is not None:
        y = norm_relu(y, es, eb)
    return y


def timeit(fn, *args, iters=32, repeat=3):
    def make(n):
        @jax.jit
        def run(*a):
            def body(acc, i):
                out = fn(a[0] + i.astype(a[0].dtype) * jnp.asarray(1e-6, a[0].dtype), *a[1:])
                return acc + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = lax.scan(body, jnp.float32(0), jnp.arange(n))
            return acc
        return run

    rn, r1 = make(iters), make(1)
    float(r1(*args)); float(rn(*args))
    best = 1e9
    for _ in range(repeat):
        t0 = time.perf_counter(); float(r1(*args))
        t1 = time.perf_counter(); float(rn(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (iters - 1))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()
    B = args.batch
    rng = np.random.RandomState(0)

    # (name, H, W, Cin, Cout, ksize, pro, epi)
    shapes = [
        ("head_conv 64x64 128->128 k3 epi", 64, 64, 128, 128, 3, False, True),
        ("stem_conv2 128x128 64->128 k3 epi", 128, 128, 64, 128, 3, False, True),
        ("stem_conv1 128x128 32->64 k3 pro+epi", 128, 128, 32, 64, 3, True, True),
        ("rb_conv0 64x64 128->64 k1 pro", 64, 64, 128, 64, 1, True, False),
        ("rb_conv1 64x64 64->64 k3 pro", 64, 64, 64, 64, 3, True, False),
        ("rb_conv2 32x32 64->128 k1 pro", 32, 32, 64, 128, 1, True, False),
    ]
    for name, H, W, C, Co, k, pro, epi in shapes:
        x = jnp.asarray(rng.randn(B, H, W, C) + 2.0, jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, k, C, Co) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(Co) * 0.1, jnp.float32)
        ps = jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32) if pro else None
        pb = jnp.asarray(0.1 * rng.randn(C), jnp.float32) if pro else None
        es = jnp.asarray(1 + 0.1 * rng.randn(Co), jnp.float32) if epi else None
        eb = jnp.asarray(0.1 * rng.randn(Co), jnp.float32) if epi else None

        t_xla = timeit(lambda xx: xla_unit(xx, w, b, ps, pb, es, eb), x,
                       iters=args.iters)
        t_pal = timeit(
            lambda xx: fused_conv_norm(xx, w, b, pro_scale=ps, pro_bias=pb,
                                       epi_scale=es, epi_bias=eb), x,
            iters=args.iters)
        gf = 2 * B * H * W * C * Co * k * k / 1e9
        print(f"{name:42s} xla {t_xla*1e6/B:7.2f} us/fr ({gf/t_xla/1e3:5.1f} TF)"
              f"  pallas {t_pal*1e6/B:7.2f} us/fr ({gf/t_pal/1e3:5.1f} TF)"
              f"  speedup {t_xla/t_pal:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
