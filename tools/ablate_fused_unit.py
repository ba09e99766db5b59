"""Ablation: where does the fused conv+norm unit's time go on-chip?

Variants on the head shape (64x64, 128->128, k3, batch 256):
  full        the shipped kernel (xm build + 3 dots + stats)
  conv_only   xm build + 3 dots, no epilogue stats
  dots_only   3 dots on a pre-built xm operand (no build, no stats)
  build_only  xm build + copy-through (no dots, no stats)
  stats_only  stats+normalize on the input (no conv at all)
  copy        pure read->write through VMEM (pipeline floor)

Usage: python tools/ablate_fused_unit.py [--batch 256] [--bt 1]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixelwiseregression_tpu.ops.pallas_fused import (
    _VMEM_LIMIT, _build_xm, _norm_affine, fused_conv_norm, pack_wcat,
)


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


def run_variant(name, kernel_body, x, extra=(), out_shape=None, bt=1):
    B, HW, C = x.shape
    out_shape = out_shape or (B, HW, C)
    Co = out_shape[-1]

    def call(xx, *e):
        return pl.pallas_call(
            kernel_body,
            grid=(B // bt,),
            in_specs=[pl.BlockSpec((bt, HW, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(a.shape, lambda b, _a=a: (0,) * _a.ndim,
                            memory_space=pltpu.VMEM) for a in e],
            out_specs=pl.BlockSpec((bt, HW, Co), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, HW, Co), x.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            interpret=False,
        )(xx, *e)

    t = timeit(call, x, *extra)
    print(f"  {name:12s} {t*1e6/B:7.2f} us/fr", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--bt", type=int, default=1)
    args = ap.parse_args()
    B, H, W, C, Co = args.batch, 64, 64, 128, 128
    HW = H * W
    bt = args.bt
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, HW, C) + 2.0, jnp.bfloat16)
    wcat = jnp.asarray(rng.randn(3, 3 * C, Co) * 0.1, jnp.bfloat16)
    es = jnp.asarray(1 + 0.1 * rng.randn(1, Co), jnp.float32)
    eb = jnp.asarray(0.1 * rng.randn(1, Co), jnp.float32)
    xm_pre = jnp.asarray(rng.randn(B, (H + 2) * W, 3 * C) * 0.5, jnp.bfloat16)

    print(f"head shape {H}x{W} {C}->{Co} k3, batch {B}, bt={bt}", flush=True)

    def full(x_ref, w_ref, es_ref, eb_ref, o_ref):
        for s in range(bt):
            xm = _build_xm(x_ref[s], H, W, C, jnp.bfloat16)
            acc = jnp.zeros((HW, Co), jnp.float32)
            for di in range(3):
                acc += jax.lax.dot_general(
                    xm[di * W: di * W + HW], w_ref[di],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            y32 = acc.astype(jnp.bfloat16).astype(jnp.float32)
            o_ref[s] = _norm_affine(y32, es_ref[:], eb_ref[:], 1e-5).astype(jnp.bfloat16)

    def conv_only(x_ref, w_ref, o_ref):
        for s in range(bt):
            xm = _build_xm(x_ref[s], H, W, C, jnp.bfloat16)
            acc = jnp.zeros((HW, Co), jnp.float32)
            for di in range(3):
                acc += jax.lax.dot_general(
                    xm[di * W: di * W + HW], w_ref[di],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[s] = acc.astype(jnp.bfloat16)

    def build_only(x_ref, o_ref):
        for s in range(bt):
            xm = _build_xm(x_ref[s], H, W, C, jnp.bfloat16)
            # consume xm cheaply: one slice add so it isn't DCE'd
            o_ref[s] = (xm[W: W + HW, C: 2 * C] + xm[0:HW, 0:C]).astype(jnp.bfloat16)

    def stats_only(x_ref, es_ref, eb_ref, o_ref):
        for s in range(bt):
            y32 = x_ref[s].astype(jnp.float32)
            o_ref[s] = _norm_affine(y32, es_ref[:], eb_ref[:], 1e-5).astype(jnp.bfloat16)

    def copy(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    run_variant("full", full, x, extra=(wcat, es, eb), bt=bt)
    run_variant("conv_only", conv_only, x, extra=(wcat,), bt=bt)
    run_variant("build_only", build_only, x, bt=bt)
    run_variant("stats_only", stats_only, x, extra=(es, eb), bt=bt)
    run_variant("copy", copy, x, bt=bt)

    # dots_only: pre-built xm as the streamed operand
    def dots_only(xm_ref, w_ref, o_ref):
        for s in range(bt):
            acc = jnp.zeros((HW, Co), jnp.float32)
            for di in range(3):
                acc += jax.lax.dot_general(
                    xm_ref[s, di * W: di * W + HW], w_ref[di],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[s] = acc.astype(jnp.bfloat16)

    def call(xx, w):
        return pl.pallas_call(
            dots_only,
            grid=(B // bt,),
            in_specs=[
                pl.BlockSpec((bt, (H + 2) * W, 3 * C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(w.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bt, HW, Co), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, HW, Co), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(xx, w)

    t = timeit(call, xm_pre, wcat)
    print(f"  {'dots_only':12s} {t*1e6/B:7.2f} us/fr", flush=True)


if __name__ == "__main__":
    main()
