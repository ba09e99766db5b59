"""Whole-hourglass fusion as a single Pallas TPU kernel.

The reference hourglass (reference: model.py:25-47) is a recursive
encoder/decoder of pre-activation bottleneck ResBlocks (model.py:6-23).
Under XLA each of its 11 ResBlocks (level=4) is ~3 convolutions plus norms
with an HBM round-trip between every one — profiling the 2-stage flagship
showed the hourglass+glue at ~45 us/frame against a ~12 us speed-of-light,
all of it memory traffic at 4x4..64x64 resolutions.

This kernel runs the ENTIRE hourglass — every ResBlock, maxpool, nearest
upsample and skip-add — inside VMEM, gridded over the batch: the activation
is read from HBM once and the result written once. Weights for all blocks
ride along as stacked arrays (one leading "block index" axis) and stay
resident across grid steps.

Numerics match the Flax path (`models.pixelwise.Hourglass`): instance-norm
stats in f32 (biased variance, eps=1e-5), activations and MXU inputs in the
model dtype, f32 accumulation. Inference-only: training keeps the XLA path
(autodiff through the Flax module), so no custom VJP is needed here.

Layout notes (why this lowers well, per the Mosaic probe results):
  * blocks are [bt, H, W, C]: W rides sublanes, C=features rides lanes
    (128 = exactly one lane tile); bt and H are untiled leading dims.
  * maxpool = reshape-split [bt,H/2,2,W/2,2,C] + max over the pair axes.
  * nearest 2x upsample = broadcast into inserted axes + merge.
  * 3x3 conv = pad(H,W) + 9 static tap slices concatenated on the lane
    axis, contracted in ONE [.,9*Ci]x[9*Ci,Co] matmul (K=576 at Ci=64
    instead of nine K=64 passes).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def num_resblocks(level: int) -> int:
    """ResBlocks in a level-L hourglass: 2 per level + 3 at the bottom."""
    return 2 * level + 3


def stack_hourglass_params(params, level: int):
    """Stack a Flax `Hourglass` param tree into per-role arrays with a
    leading block-index axis, ordered by the kernel's traversal
    (input_conv, inner..., output_conv — matching `models.pixelwise.Hourglass`
    submodule names).

    Returns a dict of 12 arrays:
      w0 [N,C,C/2], w1 [N,3,3,C/2,C/2], w2 [N,C/2,C], b0/b1 [N,C/2], b2 [N,C],
      s0/sb0 [N,C], s1/sb1/s2/sb2 [N,C/2]   (norm scale / bias)
    """
    blocks = []

    def visit(p, lv):
        blocks.append(p["input_conv"])
        if lv > 0:
            visit(p["inner"], lv - 1)
        else:
            blocks.append(p["inner"])
        blocks.append(p["output_conv"])

    visit(params, level)
    assert len(blocks) == num_resblocks(level)

    def stack(path):
        leaves = []
        for b in blocks:
            v = b
            for k in path:
                v = v[k]
            leaves.append(np.asarray(v))
        return jnp.asarray(np.stack(leaves))

    w0 = stack(("conv_0", "conv", "kernel"))[:, 0, 0]        # [N,C,C/2]
    w1 = stack(("conv_1", "conv", "kernel"))                 # [N,3,3,C/2,C/2]
    w2 = stack(("conv_2", "conv", "kernel"))[:, 0, 0]        # [N,C/2,C]
    return {
        "w0": w0, "w1": w1, "w2": w2,
        "b0": stack(("conv_0", "conv", "bias")),
        "b1": stack(("conv_1", "conv", "bias")),
        "b2": stack(("conv_2", "conv", "bias")),
        "s0": stack(("norm_0", "scale")), "sb0": stack(("norm_0", "bias")),
        "s1": stack(("norm_1", "scale")), "sb1": stack(("norm_1", "bias")),
        "s2": stack(("norm_2", "scale")), "sb2": stack(("norm_2", "bias")),
    }


def _instance_norm_relu(x, scale, bias, dtype):
    """f32 stats (biased two-pass var, eps=1e-5, matching
    models.layers._instance_norm) + ReLU, returned in the compute dtype.

    The affine apply runs in the compute dtype (stats/coefficients stay
    f32): an f32 elementwise apply would materialize 2x-sized temporaries
    of every @64 activation and OOM the 16 MB VMEM at level>=1."""
    x32 = x.astype(jnp.float32)
    # two-pass variance, matching models.layers._instance_norm (the
    # one-pass form cancels catastrophically on near-constant background
    # channels); inside the kernel x is VMEM-resident so the second read
    # is cheap
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    a = (inv * scale).astype(dtype)
    b = (bias - mean * (inv * scale)).astype(dtype)
    return jnp.maximum(x.astype(dtype) * a + b, 0.0)


def _dot_c(h, w, b):
    """1x1 conv: contract the lane (channel) axis with the spatial and batch
    dims merged into one MXU M dimension. f32 accumulation."""
    bt, hh, ww, ci = h.shape
    y = jax.lax.dot_general(
        h.reshape(bt * hh * ww, ci), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y + b).astype(h.dtype).reshape(bt, hh, ww, w.shape[-1])


def _conv3x3(h, w, b):
    """3x3 same-padding conv in output-shift form: every tap's matmul runs
    on the UNSHIFTED input (merged [bt*H*W, Ci] x [Ci, Co] — aligned
    operands, full M), and the tap outputs are shift-accumulated into a
    padded f32 buffer. Input-shift forms cost a sublane relayout per tap
    (the taps sit at sublane offsets), and the lane-concat single-matmul
    form does not lower in Mosaic at all.

    Taps are computed in PAIRS along the output axis (weights for two taps
    concatenated on N): Co=features/2=64 alone fills only half the MXU's
    128 result columns — pairing doubles MXU utilization for the op that
    carries ~70% of the hourglass FLOPs.

    y[i,j] = sum_{dy,dx} (x @ W[dy,dx])[i+dy-1, j+dx-1], accumulated as
    A += pad(z, lo=(2-dy, 2-dx)); y = A[1:H+1, 1:W+1].
    """
    w_pairs, w_last = w  # [4, Ci, 2*Co] (host-paired), [Ci, 2*Co] (hi half 0)
    bt, hh, ww, ci = h.shape
    co2 = w_last.shape[-1]
    co = co2 // 2
    h2 = h.reshape(bt * hh * ww, ci)
    taps = [(dy, dx) for dy in range(3) for dx in range(3)]

    # lane masks for the lo/hi halves, and the final [2Co, Co] lo+hi
    # combiner (sum of two stacked identities) — all built from iota, since
    # lane-SLICING a dot result does not lower ("result/input offset
    # mismatch") while full-width masked adds do.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, co2), 3)
    mlo = (lane < co).astype(jnp.float32)
    mhi = 1.0 - mlo
    s_comb = (
        jax.lax.broadcasted_iota(jnp.int32, (co2, co), 0) % co
        == jax.lax.broadcasted_iota(jnp.int32, (co2, co), 1)
    ).astype(h.dtype)

    def pad_t(z, t):
        dy, dx = t
        return jnp.pad(z, ((0, 0), (2 - dy, dy), (2 - dx, dx), (0, 0)))

    acc = None
    for k in range(4):
        z = jax.lax.dot_general(
            h2, w_pairs[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(bt, hh, ww, co2)
        contrib = pad_t(z * mlo, taps[2 * k]) + pad_t(z * mhi, taps[2 * k + 1])
        acc = contrib if acc is None else acc + contrib
    z = jax.lax.dot_general(
        h2, w_last, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(bt, hh, ww, co2)
    acc = acc + pad_t(z, taps[8])

    y2 = acc[:, 1 : hh + 1, 1 : ww + 1, :].astype(h.dtype)
    y = jax.lax.dot_general(
        y2.reshape(bt * hh * ww, co2), s_comb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(bt, hh, ww, co)
    return (y + b).astype(h.dtype)


def _hg_kernel(level, dtype,
               x_ref, w0, w1p, w1l, w2, b0, b1, b2, s0, sb0, s1, sb1, s2, sb2,
               o_ref):
    idx = [0]

    def resblock(x):
        i = idx[0]
        idx[0] += 1
        h = _instance_norm_relu(x, s0[i], sb0[i], dtype)
        h = _dot_c(h, w0[i], b0[i])
        h = _instance_norm_relu(h, s1[i], sb1[i], dtype)
        h = _conv3x3(h, (w1p[i], w1l[i]), b1[i])
        h = _instance_norm_relu(h, s2[i], sb2[i], dtype)
        h = _dot_c(h, w2[i], b2[i])
        return x + h

    def pool(x):
        # 2x2 maxpool as maximum of static pair slices. The reduction form
        # (reshape + max over the pair axes) produces a sublane-replicated
        # Mosaic layout that a following (1,2)-axis mean cannot relayout
        # from ("Invalid relayout ... replicated in destination"); the
        # slice form keeps a canonical layout.
        bt, hh, ww, c = x.shape
        a = x.reshape(bt, hh, ww // 2, 2, c)
        m = jnp.maximum(a[:, :, :, 0, :], a[:, :, :, 1, :])
        b = m.reshape(bt, hh // 2, 2, ww // 2, c)
        return jnp.maximum(b[:, :, 0, :, :], b[:, :, 1, :, :])

    def up2(x):
        bt, hh, ww, c = x.shape
        y = jnp.broadcast_to(
            x[:, :, None, :, None, :], (bt, hh, 2, ww, 2, c)
        )
        return y.reshape(bt, 2 * hh, 2 * ww, c)

    def hg(x, lv):
        x = resblock(x)
        h = pool(x)
        h = hg(h, lv - 1) if lv > 0 else resblock(h)
        h = resblock(h)
        h = up2(h)
        return h + x

    x = x_ref[...].astype(dtype)
    o_ref[...] = hg(x, level).astype(o_ref.dtype)


def hourglass_fused(x, stacked, level: int, *, block_batch: int = 1,
                    interpret: bool | None = None):
    """Run a full level-`level` hourglass on ``x`` [B, H, W, C] in one Pallas
    kernel, gridded over the batch. ``stacked`` is `stack_hourglass_params`
    output (conv weights will be cast to x.dtype; norm params stay f32).

    Semantics identical to `models.pixelwise.Hourglass.__call__` at
    inference (train=False); golden-tested against it.
    """
    b, h, w, c = x.shape
    dtype = x.dtype
    bt = block_batch
    while b % bt:
        bt -= 1
    n = num_resblocks(level)

    # pair the 3x3 tap weights on the output axis host-side (see _conv3x3;
    # in-kernel lane-concat of weight slices does not lower in Mosaic):
    # taps (0,1),(2,3),(4,5),(6,7) -> [N,4,Ci,2*Co], tap 8 alone [N,Ci,Co]
    w1 = stacked["w1"].reshape(n, 9, *stacked["w1"].shape[3:])
    w1_pairs = jnp.concatenate(
        [w1[:, 0:8:2], w1[:, 1:8:2]], axis=-1
    )  # [N,4,Ci,2*Co]
    w1_last = jnp.concatenate(
        [w1[:, 8], jnp.zeros_like(w1[:, 8])], axis=-1
    )  # [N,Ci,2*Co], hi half zero
    wgt = [
        stacked["w0"].astype(dtype),
        w1_pairs.astype(dtype), w1_last.astype(dtype),
        stacked["w2"].astype(dtype),
        stacked["b0"].astype(jnp.float32), stacked["b1"].astype(jnp.float32),
        stacked["b2"].astype(jnp.float32),
        stacked["s0"].astype(jnp.float32), stacked["sb0"].astype(jnp.float32),
        stacked["s1"].astype(jnp.float32), stacked["sb1"].astype(jnp.float32),
        stacked["s2"].astype(jnp.float32), stacked["sb2"].astype(jnp.float32),
    ]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    return pl.pallas_call(
        functools.partial(_hg_kernel, level, dtype),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *[full(a) for a in wgt],
        ],
        out_specs=pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, *wgt)
