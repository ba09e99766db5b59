"""A/B the norm+relu backward engines on the head-unit shape (round-5
train-step verdict, part 3: measure the one remaining prediction).

PERF.md part 2 closed the train verdict with the norm/relu backward chain
attributed as the residual gap (standalone 8.16 us/frame vs a ~3.8
bandwidth floor; ~10-16.8 composed per unit) and predicted a pallas
norm-backward would lose to XLA's fusion. This tool converts that
prediction into a measurement. Variants, all on the head-unit shape
(3x3 conv 128->128 @ 64x64, batch 128, bf16 acts / f32 params — the shape
of all 12 stage_{0,1}/{plane,depth}/conv_{0,1,2} units):

  normrelu_xla    composed chain backward: relu autodiff + the repo's
                  _instance_norm custom VJP (the 8.16 us/frame baseline)
  normrelu_fused  ONE custom_vjp over relu(norm(x)) in pure XLA — mask
                  recomputed from the saved norm input; the relu-output
                  residual is never read (ops/fused_normrelu.norm_relu)
  normrelu_pal1   pallas VMEM-resident backward, 1 sample / grid step
                  (3 HBM passes total: read g, read x, write dx)
  normrelu_pal8   same kernel, 8 samples / grid step
  unit_xla        conv+norm+relu backward, composed (the 24.8 baseline)
  unit_fused      conv + fused-XLA norm_relu backward
  unit_pal8       conv + pallas(bt=8) norm_relu backward

Timing: the repo's in-jit lax.scan discipline (per-iteration input
perturbation, scan-1 subtraction, interleaved sampling, median of positive
deltas) — shared with bench.py via tools/ab_common.py.

Run: python tools/normrelu_bwd_ab.py [--batch 128] [--rounds 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ab_common import make_scan_sampler, print_variants, run_interleaved


def build_samplers(batch, iters):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pixelwiseregression_tpu.models.layers import _instance_norm
    from pixelwiseregression_tpu.ops.fused_normrelu import (
        make_norm_relu_pallas,
        norm_relu,
    )

    B, H, W, C = batch, 64, 64, 128
    key = jax.random.PRNGKey(0)
    kx, kw, kr, ks = jax.random.split(key, 4)
    x0 = jax.random.normal(kx, (B, H, W, C), jnp.bfloat16)
    w0 = jax.random.normal(kw, (3, 3, C, C), jnp.float32) * 0.05
    r = jax.random.normal(kr, (B, H, W, C), jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    f32 = jnp.float32

    pal1 = make_norm_relu_pallas(bt=1)
    pal8 = make_norm_relu_pallas(bt=8)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def composed(x, s, b):
        return jax.nn.relu(_instance_norm(x, s, b, 1e-5).astype(x.dtype))

    def _treesum(t):
        return sum(jnp.sum(leaf.astype(f32))
                   for leaf in jax.tree_util.tree_leaves(t))

    def nr_loss(nr):
        def loss(x, s, b):
            return jnp.sum(nr(x, s, b).astype(f32) * r.astype(f32))
        return lambda x: _treesum(
            jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias))

    def unit_loss(nr):
        def loss(x, w, s, b):
            return jnp.sum(nr(conv(x, w), s, b).astype(f32) * r.astype(f32))
        return lambda x: _treesum(
            jax.grad(loss, argnums=(0, 1, 2, 3))(x, w0, scale, bias))

    variants = {
        "normrelu_xla": nr_loss(composed),
        "normrelu_fused": nr_loss(lambda x, s, b: norm_relu(x, s, b, 1e-5)),
        "normrelu_pal1": nr_loss(lambda x, s, b: pal1(x, s, b, 1e-5)),
        "normrelu_pal8": nr_loss(lambda x, s, b: pal8(x, s, b, 1e-5)),
        "unit_xla": unit_loss(composed),
        "unit_fused": unit_loss(lambda x, s, b: norm_relu(x, s, b, 1e-5)),
        "unit_pal8": unit_loss(lambda x, s, b: pal8(x, s, b, 1e-5)),
    }

    samplers = {}
    for name, fn in variants.items():
        samplers[name] = make_scan_sampler(fn, x0, iters)
        print(f"  compiled {name}", flush=True)
    return samplers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    import jax

    from pixelwiseregression_tpu.cli.common import apply_platform_override
    from pixelwiseregression_tpu.utils.compile_cache import enable_compile_cache

    apply_platform_override()
    enable_compile_cache()
    print(f"platform={jax.devices()[0].platform}", flush=True)

    samplers = build_samplers(args.batch, args.iters)
    results = run_interleaved(samplers, rounds=args.rounds)
    print(f"\nper-variant device time (batch {args.batch}):", flush=True)
    med = print_variants(results, args.batch, width=14)
    names = list(samplers)

    if {"normrelu_xla", "unit_xla"} <= med.keys():
        base_nr = med["normrelu_xla"] / args.batch * 1e6
        base_u = med["unit_xla"] / args.batch * 1e6
        for n in names:
            if n in med and n != "normrelu_xla" and n.startswith("normrelu"):
                v = med[n] / args.batch * 1e6
                print(f"  {n}: {v:.2f} vs xla {base_nr:.2f} "
                      f"({(base_nr-v)/base_nr*100:+.1f}%)", flush=True)
        for n in names:
            if n in med and n != "unit_xla" and n.startswith("unit"):
                v = med[n] / args.batch * 1e6
                print(f"  {n}: {v:.2f} vs xla {base_u:.2f} "
                      f"({(base_u-v)/base_u*100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
