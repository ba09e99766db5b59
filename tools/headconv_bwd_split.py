"""Split the head-conv backward class into dx / dW / norm-chain device time
(round-4 verdict item 2, option (a)).

The round-4 decomposition (PERF.md "Round 4 — train-step fwd/bwd
decomposition") measured the 12-head-conv backward class at 215.7 us/frame
against a ~148 us/frame floor — but that floor counted ONLY the dx+dW conv
pair at forward MXU efficiency. Each profiled component's 12 ops also
contain the fused instance-norm/relu backward (a VPU/HBM chain with its own
bandwidth floor), so the real addressable gap may be much smaller. This
tool measures, on one representative head-conv unit
(3x3 conv 128->128 @ 64x64, batch 128, bf16 activations / f32 params —
exactly the shape of stage_{0,1}/{plane,depth}/conv_{0,1,2}):

  fwd         conv+norm+relu forward (reference point)
  convpair    backward of the conv alone (dx + dW)
  dx_only     input gradient alone
  dw_only     kernel gradient alone
  unit_bwd    backward of conv+norm+relu (what the profile attributes
              per component: conv pair + the fused norm/relu chain)
  normrelu    backward of norm+relu alone (the VPU/HBM chain)
  dw_dot9     ALTERNATE dW formulation: 9 shifted dot_generals
              (one [Ci, B*H*W] x [B*H*W, Co] GEMM per kernel tap) — K is
              huge so each dot is MXU-ideal, but x is re-read 9x from HBM;
              measures whether XLA's conv-grad lowering leaves MXU time on
              the table or is already bandwidth-smart

All variants are timed with the repo's in-jit lax.scan methodology
(per-iteration input perturbation, scan-1 subtraction, interleaved
sampling, median of positive deltas) — shared with bench.py via
tools/ab_common.py.

Run: python tools/headconv_bwd_split.py [--batch 128] [--rounds 4]
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

    B, H, W, C = batch, 64, 64, 128
    key = jax.random.PRNGKey(0)
    kx, kw, kr, ks = jax.random.split(key, 4)
    x0 = jax.random.normal(kx, (B, H, W, C), jnp.bfloat16)
    w0 = jax.random.normal(kw, (3, 3, C, C), jnp.float32) * 0.05
    r = jax.random.normal(kr, (B, H, W, C), jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def unit(x, w, scale, bias):
        # conv -> instance norm (repo custom-vjp fused backward) -> relu,
        # the exact per-component chain the train profile attributes
        y = conv(x, w)
        y = _instance_norm(y, scale, bias, 1e-5)
        return jax.nn.relu(y).astype(jnp.bfloat16)

    f32 = jnp.float32

    def loss_conv(x, w):
        return jnp.sum(conv(x, w).astype(f32) * r.astype(f32))

    def loss_unit(x, w, scale, bias):
        return jnp.sum(unit(x, w, scale, bias).astype(f32) * r.astype(f32))

    def loss_normrelu(x, scale, bias):
        y = _instance_norm(x, scale, bias, 1e-5)
        return jnp.sum(jax.nn.relu(y).astype(f32) * r.astype(f32))

    def dw_dot9(x, dy):
        # dW[dh,dw,ci,co] = sum_{b,h,w} x_pad[b,h+dh,w+dw,ci] * dy[b,h,w,co]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = []
        for dh in range(3):
            row = []
            for dw_ in range(3):
                xs = lax.dynamic_slice(xp, (0, dh, dw_, 0), (B, H, W, C))
                row.append(lax.dot_general(
                    xs, dy, (((0, 1, 2), (0, 1, 2)), ((), ())),
                    preferred_element_type=f32))
            taps.append(jnp.stack(row))
        return jnp.stack(taps)  # [3,3,Ci,Co]

    variants = {
        "fwd": lambda x: jnp.sum(
            unit(x, w0, scale, bias).astype(f32)),
        "convpair": lambda x: _treesum(jax.grad(loss_conv, argnums=(0, 1))(x, w0)),
        "dx_only": lambda x: _treesum([jax.grad(loss_conv, argnums=0)(x, w0)]),
        "dw_only": lambda x: _treesum([jax.grad(loss_conv, argnums=1)(x, w0)]),
        "unit_bwd": lambda x: _treesum(
            jax.grad(loss_unit, argnums=(0, 1, 2, 3))(x, w0, scale, bias)),
        "normrelu": lambda x: _treesum(
            jax.grad(loss_normrelu, argnums=(0, 1, 2))(x, scale, bias)),
        "dw_dot9": lambda x: _treesum([dw_dot9(x, r)]),
    }

    def _treesum(t):
        return sum(jnp.sum(leaf.astype(f32)) for leaf in jax.tree_util.tree_leaves(t))

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
    med = print_variants(results, args.batch, width=9)

    if {"convpair", "normrelu", "unit_bwd", "dx_only", "dw_only"} <= med.keys():
        add = med["convpair"] + med["normrelu"]
        print(f"\n  convpair+normrelu = {add/args.batch*1e6:.2f} us/frame vs "
              f"unit_bwd {med['unit_bwd']/args.batch*1e6:.2f} "
              f"(fusion saves {(add-med['unit_bwd'])/args.batch*1e6:.2f})",
              flush=True)
        print(f"  dx {med['dx_only']/args.batch*1e6:.2f} + dw "
              f"{med['dw_only']/args.batch*1e6:.2f} us/frame; "
              f"dw_dot9 alternative "
              f"{med.get('dw_dot9', float('nan'))/args.batch*1e6:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
