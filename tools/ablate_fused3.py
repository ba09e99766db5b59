"""Round-3 decision run: chained head/rb with bt-interleaving, and the
128x128 DMA diagnosis.

  head chain x6 at bt in {1,2,4}     — does interleave close the gap to
                                        XLA's 7.97 (floor 6.61)?
  rb merged x6 at bt in {1,2}        — ditto vs XLA's 11.15
  copy @128^2: block [1,HW,C] / [HW,C] 2D / banded [1,HW/4,C]
                                     — why are 128^2 kernels 3x off BW?

Usage: python tools/ablate_fused3.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixelwiseregression_tpu.ops.pallas_fused import _VMEM_LIMIT, fused_chain


def timeit(fn, *args, iters=8, repeat=3):
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
    B, H, W, C = 256, 64, 64, 128
    K = 6
    rng = np.random.RandomState(0)
    x4 = jnp.asarray(rng.randn(B, H, W, C) + 2.0, jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    es = jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32)
    eb = jnp.asarray(0.1 * rng.randn(C), jnp.float32)
    unit = [{"kernel": w, "bias": b, "epi": (es, eb)}]
    gf = 2 * B * H * W * C * C * 9 * K / 1e9

    for bt in (1, 2, 4):
        def chain(x, _bt=bt):
            for _ in range(K):
                x = fused_chain(x, unit, bt=_bt)
            return x

        t = timeit(chain, x4)
        print(f"head chain x{K} bt={bt}: {t*1e6/B/K:7.2f} us/fr/unit ({gf/t/1e3:5.1f} TF)", flush=True)

    Ch = C // 2
    w0 = jnp.asarray(rng.randn(1, 1, C, Ch) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, Ch, Ch) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(1, 1, Ch, C) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.randn(Ch) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(Ch) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    rb_units = [
        {"kernel": w0, "bias": b0,
         "pro": (jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32),
                 jnp.asarray(0.1 * rng.randn(C), jnp.float32))},
        {"kernel": w1, "bias": b1,
         "pro": (jnp.asarray(1 + 0.1 * rng.randn(Ch), jnp.float32),
                 jnp.asarray(0.1 * rng.randn(Ch), jnp.float32))},
        {"kernel": w2, "bias": b2,
         "pro": (jnp.asarray(1 + 0.1 * rng.randn(Ch), jnp.float32),
                 jnp.asarray(0.1 * rng.randn(Ch), jnp.float32))},
    ]
    gf_rb = 2 * B * H * W * (C * Ch + Ch * Ch * 9 + Ch * C) * K / 1e9
    for bt in (1, 2):
        def chain_rb(x, _bt=bt):
            for _ in range(K):
                x = fused_chain(x, rb_units, skip=x, bt=_bt)
            return x

        t = timeit(chain_rb, x4)
        print(f"rb merged x{K} bt={bt}:  {t*1e6/B/K:7.2f} us/fr/rb ({gf_rb/t/1e3:5.1f} TF)", flush=True)

    # ---- 128^2 DMA diagnosis ----
    Hs = Ws = 128
    HWs = Hs * Ws
    Cs = 64
    xs3 = jnp.asarray(rng.randn(B, HWs, Cs), jnp.bfloat16)
    xs2 = xs3.reshape(B * HWs, Cs)

    def copy3(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    def run_copy(name, xx, block, grid, kern):
        nd = len(block)

        def call(v):
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[pl.BlockSpec(block, lambda *g: g + (0,) * (nd - len(g)),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(block, lambda *g: g + (0,) * (nd - len(g)),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(xx.shape, xx.dtype),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            )(v)

        t = timeit(call, xx)
        mb = np.prod(xx.shape) * 2 * 2 / 1e6  # read+write
        print(f"copy128 {name:22s} {t*1e6/B:7.2f} us/fr ({mb/t/1e3:6.1f} GB/s)", flush=True)

    run_copy("3D [1,HW,C]", xs3, (1, HWs, Cs), (B,), copy3)
    run_copy("3D banded [1,HW/4,C]", xs3, (1, HWs // 4, Cs), (B, 4),
             lambda x_ref, o_ref: o_ref.__setitem__(slice(None), x_ref[:]))

    def copy2(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    def call2(v):
        return pl.pallas_call(
            copy2,
            grid=(B,),
            in_specs=[pl.BlockSpec((HWs, Cs), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((HWs, Cs), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xs2.shape, xs2.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(v)

    t = timeit(call2, xs2)
    mb = np.prod(xs2.shape) * 2 * 2 / 1e6
    print(f"copy128 {'2D [HW,C] rowblocks':22s} {t*1e6/B:7.2f} us/fr ({mb/t/1e3:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
