"""Chained A/B: K back-to-back conv+instance-norm units, XLA vs Pallas.

Chaining models production exactly (each unit reads its input from HBM and
writes its output there) and removes the single-shot harness bias where the
scan's perturbation add and reduction fuse into XLA's conv for free but
cost a standalone Pallas kernel two extra HBM passes.

Variants:
  xla        conv -> two-pass instance norm -> relu (the shipped path)
  xla_fast   conv -> one-pass norm (round-1 parity-breaking form; the
             traffic floor XLA can reach)
  pallas     fused kernel, 3 accumulated dots ([HW,3C]@[3C,Co])
  pallas9    fused kernel, single dot on the 9-tap concat ([HW,9C]@[9C,Co])

Also a ResBlock triple (norm->1x1, norm->3x3, norm->1x1+skip) A/B.

Usage: python tools/bench_fused_chain.py [--batch 256] [--k 6] [--iters 8]
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


def xla_unit(x, w, b, es, eb, fast=False, eps=1e-5):
    act = x.dtype
    k = w.shape[0]
    pad = k // 2
    y = lax.conv_general_dilated(
        x, w.astype(act), window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = (y + b.astype(act)).astype(act)
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=(1, 2), keepdims=True)
    if fast:
        var = jnp.maximum(jnp.mean(jnp.square(y32), axis=(1, 2), keepdims=True)
                          - jnp.square(mean), 0.0)
    else:
        var = jnp.mean(jnp.square(y32 - mean), axis=(1, 2), keepdims=True)
    inv = lax.rsqrt(var + eps)
    a = inv * es
    return jnp.maximum(y32 * a + (eb - mean * a), 0.0).astype(act)


def make_pallas_unit(B, H, W, C, Co, single_dot):
    HW = H * W

    def kern(x_ref, w_ref, es_ref, eb_ref, o_ref):
        xm_pad = _build_xm(x_ref[0], H, W, C, jnp.bfloat16)
        if single_dot:
            xm9 = jnp.concatenate(
                [xm_pad[0:HW], xm_pad[W:W + HW], xm_pad[2 * W:2 * W + HW]],
                axis=1)
            acc = jax.lax.dot_general(
                xm9, w_ref[:].reshape(9 * C, Co),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc = jnp.zeros((HW, Co), jnp.float32)
            for di in range(3):
                acc += jax.lax.dot_general(
                    xm_pad[di * W: di * W + HW], w_ref[di],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        y32 = acc.astype(jnp.bfloat16).astype(jnp.float32)
        o_ref[0] = _norm_affine(y32, es_ref[:], eb_ref[:], 1e-5).astype(jnp.bfloat16)

    def unit(x, wcat, es, eb):
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, HW, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(wcat.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(es.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(eb.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, HW, Co), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, HW, Co), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(x, wcat, es, eb)

    return unit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip_rb", action="store_true")
    args = ap.parse_args()
    B, H, W, C = args.batch, 64, 64, 128
    HW, K = H * W, args.k
    rng = np.random.RandomState(0)

    x4 = jnp.asarray(rng.randn(B, H, W, C) + 2.0, jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    es = jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32)
    eb = jnp.asarray(0.1 * rng.randn(C), jnp.float32)
    es2, eb2 = es.reshape(1, C), eb.reshape(1, C)
    wcat = pack_wcat(w).astype(jnp.bfloat16)

    gf = 2 * B * HW * C * C * 9 * K / 1e9

    def chain_xla(x, fast):
        for _ in range(K):
            x = xla_unit(x, w, b, es, eb, fast=fast)
        return x

    t = timeit(lambda xx: chain_xla(xx, False), x4, iters=args.iters)
    print(f"head chain x{K}: xla      {t*1e6/B/K:7.2f} us/fr/unit ({gf/t/1e3:5.1f} TF)", flush=True)
    t = timeit(lambda xx: chain_xla(xx, True), x4, iters=args.iters)
    print(f"head chain x{K}: xla_fast {t*1e6/B/K:7.2f} us/fr/unit ({gf/t/1e3:5.1f} TF)", flush=True)

    # compensated one-pass (exact, but the TwoSum reduce does not fuse
    # into the conv -> measured slower than two-pass; layers.py)
    from pixelwiseregression_tpu.models.layers import _instance_norm_fwd_comp

    def unit_comp(x):
        k = w.shape[0]
        pad = k // 2
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = (y + b.astype(x.dtype)).astype(x.dtype)
        out, _ = _instance_norm_fwd_comp(y, es, eb, 1e-5)
        return jnp.maximum(out, 0.0).astype(x.dtype)

    def chain_comp(x):
        for _ in range(K):
            x = unit_comp(x)
        return x

    t = timeit(chain_comp, x4, iters=args.iters)
    print(f"head chain x{K}: xla_comp {t*1e6/B/K:7.2f} us/fr/unit ({gf/t/1e3:5.1f} TF)", flush=True)

    # bias folded into eb for the pallas unit (bias-add then norm: the norm's
    # mean subtraction cancels a constant bias, but keep numerics aligned by
    # adding it inside: here we simply fold b into the affine for speed A/B)
    for single_dot, name in ((False, "pallas3"), (True, "pallas9")):
        unit = make_pallas_unit(B, H, W, C, C, single_dot)
        x2 = x4.reshape(B, HW, C)

        def chain_p(xx):
            for _ in range(K):
                xx = unit(xx, wcat, es2, eb2)
            return xx

        t = timeit(chain_p, x2, iters=args.iters)
        print(f"head chain x{K}: {name}  {t*1e6/B/K:7.2f} us/fr/unit ({gf/t/1e3:5.1f} TF)", flush=True)

    if args.skip_rb:
        return

    # ---- ResBlock triple (128 -> 64 -> 64 -> 128 + skip), res 64 ----
    Ch = C // 2
    w0 = jnp.asarray(rng.randn(1, 1, C, Ch) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, Ch, Ch) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(1, 1, Ch, C) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.randn(Ch) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(Ch) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    n0s = jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32)
    n0b = jnp.asarray(0.1 * rng.randn(C), jnp.float32)
    n1s = jnp.asarray(1 + 0.1 * rng.randn(Ch), jnp.float32)
    n1b = jnp.asarray(0.1 * rng.randn(Ch), jnp.float32)
    n2s = jnp.asarray(1 + 0.1 * rng.randn(Ch), jnp.float32)
    n2b = jnp.asarray(0.1 * rng.randn(Ch), jnp.float32)

    def norm_relu(x, s, bb, eps=1e-5):
        y32 = x.astype(jnp.float32)
        mean = jnp.mean(y32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(y32 - mean), axis=(1, 2), keepdims=True)
        a = lax.rsqrt(var + eps) * s
        return jnp.maximum(y32 * a + (bb - mean * a), 0.0).astype(x.dtype)

    def conv(x, w_, b_, stride=1):
        k = w_.shape[0]
        pad = k // 2
        y = lax.conv_general_dilated(
            x, w_.astype(x.dtype), window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (y + b_.astype(x.dtype)).astype(x.dtype)

    def rb_xla(x):
        h = conv(norm_relu(x, n0s, n0b), w0, b0)
        h = conv(norm_relu(h, n1s, n1b), w1, b1)
        h = conv(norm_relu(h, n2s, n2b), w2, b2)
        return x + h

    def chain_rb_xla(x):
        for _ in range(K):
            x = rb_xla(x)
        return x

    gf_rb = 2 * B * HW * (C * Ch + Ch * Ch * 9 + Ch * C) * K / 1e9
    t = timeit(chain_rb_xla, x4, iters=args.iters)
    print(f"resblock x{K}:   xla      {t*1e6/B/K:7.2f} us/fr/rb ({gf_rb/t/1e3:5.1f} TF)", flush=True)

    def rb_pallas(x):
        h = fused_conv_norm(x, w0, b0, pro_scale=n0s, pro_bias=n0b)
        h = fused_conv_norm(h, w1, b1, pro_scale=n1s, pro_bias=n1b)
        return fused_conv_norm(h, w2, b2, pro_scale=n2s, pro_bias=n2b, skip=x)

    def chain_rb_p(x):
        for _ in range(K):
            x = rb_pallas(x)
        return x

    t = timeit(chain_rb_p, x4, iters=args.iters)
    print(f"resblock x{K}:   pallas   {t*1e6/B/K:7.2f} us/fr/rb ({gf_rb/t/1e3:5.1f} TF)", flush=True)

    # ---- merged kernels: whole chain per pallas_call ----
    from pixelwiseregression_tpu.ops.pallas_fused import fused_chain

    head_units = [{"kernel": w, "bias": b, "epi": (es, eb)} for _ in range(3)]

    def chain_head_merged(x):
        for _ in range(K // 3):
            x = fused_chain(x, head_units)
        return x

    reps = K // 3
    gf_h = 2 * B * HW * C * C * 9 * 3 * reps / 1e9
    t = timeit(chain_head_merged, x4, iters=args.iters)
    print(f"head merged3 x{reps}: pallas {t*1e6/B/(3*reps):7.2f} us/fr/unit ({gf_h/t/1e3:5.1f} TF)", flush=True)

    rb_units = [
        {"kernel": w0, "bias": b0, "pro": (n0s, n0b)},
        {"kernel": w1, "bias": b1, "pro": (n1s, n1b)},
        {"kernel": w2, "bias": b2, "pro": (n2s, n2b)},
    ]

    def chain_rb_merged(x):
        for _ in range(K):
            x = fused_chain(x, rb_units, skip=x)
        return x

    t = timeit(chain_rb_merged, x4, iters=args.iters)
    print(f"resblock x{K}:   merged   {t*1e6/B/K:7.2f} us/fr/rb ({gf_rb/t/1e3:5.1f} TF)", flush=True)

    # ---- stem pair @128x128: (pro n0) conv1 32->64 (epi n1) -> conv2
    # 64->128 (epi n2). XLA's var reads here are 2-4 MB/sample and cannot
    # hide under the MXU (the stem is bandwidth-bound), so this is where
    # the fused kernel's traffic advantage is largest.
    Hs = Ws = 128
    xs = jnp.asarray(rng.randn(B, Hs, Ws, 32) + 1.0, jnp.bfloat16)
    sw1 = jnp.asarray(rng.randn(3, 3, 32, 64) * 0.1, jnp.float32)
    sb1 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    sw2 = jnp.asarray(rng.randn(3, 3, 64, 128) * 0.05, jnp.float32)
    sb2 = jnp.asarray(rng.randn(128) * 0.1, jnp.float32)
    s0s = jnp.asarray(1 + 0.1 * rng.randn(32), jnp.float32)
    s0b = jnp.asarray(0.1 * rng.randn(32), jnp.float32)
    s1s = jnp.asarray(1 + 0.1 * rng.randn(64), jnp.float32)
    s1b = jnp.asarray(0.1 * rng.randn(64), jnp.float32)
    s2s = jnp.asarray(1 + 0.1 * rng.randn(128), jnp.float32)
    s2b = jnp.asarray(0.1 * rng.randn(128), jnp.float32)

    def stem_xla(x):
        h = conv(norm_relu(x, s0s, s0b), sw1, sb1)
        h = norm_relu(h, s1s, s1b)
        h = conv(h, sw2, sb2)
        return norm_relu(h, s2s, s2b)

    gf_st = 2 * B * Hs * Ws * (32 * 64 * 9 + 64 * 128 * 9) / 1e9
    t = timeit(stem_xla, xs, iters=args.iters)
    print(f"stem pair @128: xla      {t*1e6/B:7.2f} us/fr ({gf_st/t/1e3:5.1f} TF)", flush=True)

    stem_units = [
        {"kernel": sw1, "bias": sb1, "pro": (s0s, s0b), "epi": (s1s, s1b)},
        {"kernel": sw2, "bias": sb2, "epi": (s2s, s2b)},
    ]

    def stem_merged(x):
        return fused_chain(x, stem_units)

    t = timeit(stem_merged, xs, iters=args.iters)
    print(f"stem pair @128: merged   {t*1e6/B:7.2f} us/fr ({gf_st/t/1e3:5.1f} TF)", flush=True)


if __name__ == "__main__":
    main()
