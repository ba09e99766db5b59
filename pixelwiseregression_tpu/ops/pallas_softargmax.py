"""Fused soft-argmax decoder as a Pallas TPU kernel.

One VMEM pass per batch item fuses everything after the two conv heads
(reference: model.py:81-97 + 116-132): learned-temperature softmax over H*W,
the u/v COM-filter reductions, and the masked depth expectation — producing
the normalized heatmaps (needed for stage chaining / losses) and uvd in a
single kernel instead of ~10 XLA reductions over [B, J, 64, 64] tensors.

Layout: maps are processed as ``[J, HW]`` blocks — HW rides the lane
dimension (4096 = 32 full lanes of 128) and J the sublanes. The transposed
``[HW, J]`` layout would pad J up to 128 lanes and blow the 16 MB VMEM
budget ~9x (observed as a scoped-vmem OOM on v5e at batch 256).

The backward pass is a second Pallas kernel via ``jax.custom_vjp``
(softmax-backward + quotient-rule for the depth expectation). Gradients are
exact for logits, depthmaps, label_img and the temperature ``w``; the mask
cotangent is returned as zeros (the mask is 0/1 input data — its gradient is
never consumed in training; the grad-equivalence test excludes it).

Only the default ``softmax`` normalization runs in Pallas; the ``sum`` method
falls back to the XLA reference implementation. On non-TPU backends the
kernels run in interpreter mode (tests) — `soft_argmax_decode` (pure XLA)
remains the semantic ground truth either way.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixelwiseregression_tpu.ops.heatmap import com_filter
from pixelwiseregression_tpu.ops.softargmax import soft_argmax_decode

_EPS = 1e-14


def _flat_com_filters(h: int, w: int):
    """COM filters flattened to [1, HW] (single source of truth:
    ops.heatmap.com_filter, reference: utils.py:24-35)."""
    f = com_filter(w, h).astype(np.float32).reshape(2, 1, -1)
    return f[0], f[1]


def _fwd_kernel(x_ref, dm_ref, label_ref, mask_ref, w_ref, fu_ref, fv_ref,
                hm_ref, uvd_ref):
    # inputs may arrive bf16 (inference fast boundary): compute in f32
    x = x_ref[0].astype(jnp.float32)           # [J, HW]
    w = w_ref[:]                               # [J, 1]
    z = x * w
    zmax = jnp.max(z, axis=1, keepdims=True)
    e = jnp.exp(z - zmax)
    s = jnp.sum(e, axis=1, keepdims=True)
    p = e / s                                  # [J, HW]

    u = jnp.sum(fu_ref[:] * p, axis=1)         # [J]
    v = jnp.sum(fv_ref[:] * p, axis=1)

    m = mask_ref[0].astype(jnp.float32)        # [1, HW]
    recon = (dm_ref[0].astype(jnp.float32)
             + label_ref[0].astype(jnp.float32)) * m  # label broadcasts
    mh = p * m
    num = jnp.sum(mh * recon, axis=1)
    den = jnp.sum(mh, axis=1)
    d = num / (den + _EPS)

    hm_ref[0] = p.astype(hm_ref.dtype)
    uvd_ref[0] = jnp.stack([u, v, d], axis=0)  # [3, J]


def _bwd_kernel(x_ref, dm_ref, label_ref, mask_ref, w_ref, fu_ref, fv_ref,
                g_hm_ref, g_uvd_ref,
                dx_ref, ddm_ref, dlabel_ref, dw_ref):
    # recompute the forward (cheaper than spilling p to HBM twice)
    x = x_ref[0]
    w = w_ref[:]
    z = x * w
    zmax = jnp.max(z, axis=1, keepdims=True)
    e = jnp.exp(z - zmax)
    s = jnp.sum(e, axis=1, keepdims=True)
    p = e / s

    m = mask_ref[0]
    recon = (dm_ref[0] + label_ref[0]) * m
    mh = p * m
    num = jnp.sum(mh * recon, axis=1, keepdims=True)   # [J, 1]
    den = jnp.sum(mh, axis=1, keepdims=True) + _EPS

    g_u = g_uvd_ref[0, 0:1, :]   # [1, J]
    g_v = g_uvd_ref[0, 1:2, :]
    g_d = g_uvd_ref[0, 2:3, :]
    g_u_col = jnp.transpose(g_u)  # [J, 1]
    g_v_col = jnp.transpose(g_v)
    g_d_col = jnp.transpose(g_d)

    # d = num/den; dd/d(mh_i) = recon_i/den - num/den^2 ; mh = p*m
    dd_dp = m * (recon / den - num / (den * den))       # [J, HW]
    # dd/d(recon_i) = mh_i/den; recon = (dm+label)*m
    ddm = g_d_col * mh / den * m                         # [J, HW]
    dlabel = jnp.sum(ddm, axis=0, keepdims=True)         # [1, HW]

    g_p = g_hm_ref[0] + g_u_col * fu_ref[:] + g_v_col * fv_ref[:] + g_d_col * dd_dp
    # softmax backward: dz = p * (g_p - sum(p * g_p))
    inner = jnp.sum(p * g_p, axis=1, keepdims=True)
    dz = p * (g_p - inner)
    dx_ref[0] = dz * w
    ddm_ref[0] = ddm
    dlabel_ref[0] = dlabel
    dw_ref[0] = jnp.sum(dz * x, axis=1, keepdims=True)  # [J, 1]


def _specs(hw: int, j: int):
    blk = pl.BlockSpec((1, j, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    blk1 = pl.BlockSpec((1, 1, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((j, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((1, hw), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return blk, blk1, w_spec, f_spec


def _pallas_forward(x, dm, label, mask, w, h: int, wd: int, hm_dtype=jnp.float32):
    b, j, hw = x.shape
    fu, fv = _flat_com_filters(h, wd)
    blk, blk1, w_spec, f_spec = _specs(hw, j)
    interpret = jax.default_backend() != "tpu"
    hm, uvd = pl.pallas_call(
        _fwd_kernel,
        grid=(b,),
        in_specs=[blk, blk, blk1, blk1, w_spec, f_spec, f_spec],
        out_specs=[
            blk,
            pl.BlockSpec((1, 3, j), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, j, hw), hm_dtype),
            jax.ShapeDtypeStruct((b, 3, j), jnp.float32),
        ],
        interpret=interpret,
    )(x, dm, label, mask, w.reshape(j, 1), jnp.asarray(fu), jnp.asarray(fv))
    return hm, uvd


def _pallas_backward(x, dm, label, mask, w, g_hm, g_uvd, h: int, wd: int):
    b, j, hw = x.shape
    fu, fv = _flat_com_filters(h, wd)
    blk, blk1, w_spec, f_spec = _specs(hw, j)
    interpret = jax.default_backend() != "tpu"
    dx, ddm, dlabel, dw = pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        in_specs=[
            blk, blk, blk1, blk1, w_spec, f_spec, f_spec,
            blk,
            pl.BlockSpec((1, 3, j), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            blk, blk, blk1,
            pl.BlockSpec((1, j, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, j, hw), jnp.float32),
            jax.ShapeDtypeStruct((b, j, hw), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, hw), jnp.float32),
            jax.ShapeDtypeStruct((b, j, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, dm, label, mask, w.reshape(j, 1), jnp.asarray(fu), jnp.asarray(fv),
      g_hm, g_uvd)
    return dx, ddm, dlabel, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _decode_flat(x, dm, label, mask, w, h, wd):
    hm, uvd = _pallas_forward(x, dm, label, mask, w, h, wd)
    return hm, uvd


def _decode_flat_fwd(x, dm, label, mask, w, h, wd):
    out = _pallas_forward(x, dm, label, mask, w, h, wd)
    return out, (x, dm, label, mask, w)


def _decode_flat_bwd(h, wd, res, grads):
    x, dm, label, mask, w = res
    g_hm, g_uvd = grads
    dx, ddm, dlabel, dw = _pallas_backward(
        x, dm, label, mask, w,
        g_hm.astype(jnp.float32), g_uvd.astype(jnp.float32), h, wd,
    )
    # per-batch-item dw blocks [B, J, 1] reduce over the batch
    return dx, ddm, dlabel, jnp.zeros_like(mask), jnp.sum(dw[:, :, 0], axis=0)


_decode_flat.defvjp(_decode_flat_fwd, _decode_flat_bwd)


def soft_argmax_decode_pallas(logits, depthmaps, label_img, mask, w,
                              method="softmax", fast_boundary=False):
    """Drop-in replacement for `ops.softargmax.soft_argmax_decode`.

    Args/returns identical: maps NHWC ``[B, H, W, J]``, label/mask
    ``[B, H, W, 1]``, ``w`` ``[J]``; returns (heatmaps ``[B, H, W, J]``,
    uvd ``[B, J, 3]`` f32).

    ``fast_boundary=True`` (inference-only) keeps the ``[J, HW]`` boundary
    relayouts in the maps' NATIVE dtype (bf16 under the mixed-precision
    policy: half the transpose traffic both ways — the reason the kernel
    used to lose ~2.5% to the XLA decoder forward-only) and emits bf16
    heatmaps (stage chaining casts them to the model dtype anyway). The
    kernel computes in f32 either way. No custom VJP on this path — use it
    only under ``train=False``.
    """
    if method != "softmax":
        return soft_argmax_decode(logits, depthmaps, label_img, mask, w, method)

    b, h, wd, j = logits.shape
    hw = h * wd

    map_dtype = logits.dtype if fast_boundary else jnp.float32

    def to_jhw(t, c):
        return jnp.transpose(t.astype(map_dtype).reshape(b, hw, c), (0, 2, 1))

    x = to_jhw(logits, j)
    dm = to_jhw(depthmaps, j)
    lab = to_jhw(label_img, 1)
    msk = to_jhw(mask, 1)
    if fast_boundary:
        hm, uvd = _pallas_forward(x, dm, lab, msk, w.astype(jnp.float32),
                                  h, wd, hm_dtype=map_dtype)
    else:
        hm, uvd = _decode_flat(x, dm, lab, msk, w.astype(jnp.float32), h, wd)
    hm = jnp.transpose(hm, (0, 2, 1)).reshape(b, h, wd, j)
    return hm, jnp.transpose(uvd, (0, 2, 1))
