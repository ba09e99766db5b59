"""Paired evaluation of the plane+depth regression heads (inference only).

Both heads read the SAME hourglass output (reference model.py:141-149), and
their final convs emit only J channels each — J=14 fills 14 of the MXU's 128
result columns, so each conv_3 pays a full column pass for 11% of it. This
module evaluates the two heads as one fused computation on the **unchanged
parameter tree** (params stay under ``plane/...`` and ``depth/...``; kernels
are concatenated at apply time), with numerics exact up to conv summation
order — every output channel keeps its exact contraction set, so the only
possible deviation is reassociation rounding of the conv itself (measured
0 for the merged/grouped convs, ~1 ulp for the block-diagonal conv_3 on
CPU f32; tests/test_paired_heads.py):

* ``conv_0``: one conv with Co=2C on the shared input — halves the input
  read, same MXU passes (per-output-channel contractions unchanged).
* ``conv_1/2``: either separate (default) or ``feature_group_count=2`` —
  groups compute independently, so both are exact; measured on-chip.
* ``conv_3``: ONE dense conv with a block-diagonal ``[k,k,2C,2J]`` kernel.
  The MXU rounds Co up to 128 columns either way, so doubling K at fixed
  padded-Co costs zero extra passes, and the zero blocks contribute exact
  zeros to the f32 accumulator — two column passes become one.

Instance-norm statistics are per-channel, so applying one norm to the
concatenated activations with concatenated scale/bias/anchor params is
exact. The pairing is selected only when no quant mode is active (int8
convs keep their own calibration plumbing) and only at inference — training
keeps the plain per-head graph (flax modules own the anchor-EMA updates).

VERDICT (v5e, round 3 — measured, rejected as default): every strategy
LOSES to the plain per-head graph. Interleaved same-process full-model A/B
(tools/bench_paired_model.py --twice, batch 256, bf16, anchored norm):
stage-1 off 94.8/96.8 vs sep/separate 103.1/102.4 us/frame; stage-2 off
162.1/161.9 vs 174.6/174.6. Isolated-chain microbench
(tools/bench_head_pair.py): separate 43.30, pair0 43.10, grouped 45.34,
blockdiag conv_3 49.16, concat3 44.21 us/frame. Two mechanisms: (1) the
channel slice after the merged conv_0 stops XLA fusing the norm+relu
epilogue into the consuming convs — the same slice-kills-fusion failure
that sank the round-2 data-anchored norm; (2) the block-diagonal conv_3
costs more despite identical MXU pass arithmetic (the compiler does not
exploit the zero blocks). An early non-interleaved run measured
sep/separate at 86.7 us/frame (a would-be 10% win); the order-controlled
re-measurement above shows that was window drift — which is why
`--twice` exists. Kept as a first-class config (default off) with exact
numerics and tests, for future toolchains where the fusion behavior may
differ.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from jax import lax, nn as jnn

from pixelwiseregression_tpu.models.layers import (
    InstanceNorm,
    _instance_norm,
    _instance_norm_anchored,
    _instance_norm_fast,
)

_NORM_EPS = 1e-5
# single source of truth: the debias factor must use the SAME momentum the
# InstanceNorm modules calibrated the anchors with (PixelwiseRegression
# never overrides the class default, asserted here against drift)
_ANCHOR_MOMENTUM = InstanceNorm.anchor_momentum


def _conv(x, kernel, bias, *, groups: int = 1, dtype):
    """Functionally identical to layers.Conv/nn.Conv: promote to the
    activation dtype, explicit k//2 padding (torch semantics), bias add."""
    x = x.astype(dtype)
    kernel = kernel.astype(dtype)
    k = kernel.shape[0]
    pad = k // 2
    y = lax.conv_general_dilated(
        x, kernel, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + bias.astype(dtype)


def _debiased_anchor(ns):
    debias = 1.0 - jnp.power(jnp.float32(_ANCHOR_MOMENTUM), ns["anchor_n"])
    return jnp.where(debias > 0,
                     ns["anchor"] / jnp.maximum(debias, 1e-12), 0.0)


def _norm(x, np_, ns, method: str, dtype):
    """One functional InstanceNorm, mirroring layers.InstanceNorm.__call__
    (inference: anchors read-only, anchored falls back to exact two-pass
    when the checkpoint carries no batch_stats)."""
    scale, bias = np_["scale"], np_["bias"]
    if method == "instance_anchored" and ns is not None and "anchor" in ns:
        y, _ = _instance_norm_anchored(x, scale, bias, _debiased_anchor(ns),
                                       _NORM_EPS)
    elif method == "instance_fast":
        y = _instance_norm_fast(x, scale, bias, _NORM_EPS)
    else:
        y = _instance_norm(x, scale, bias, _NORM_EPS)
    return y.astype(dtype)


def _norm_pair(h, np_p, np_d, ns_p, ns_d, method: str, dtype):
    """Norm over concatenated [.., 2C] activations: per-channel stats make
    the concatenated application exact."""
    scale = jnp.concatenate([np_p["scale"], np_d["scale"]])
    bias = jnp.concatenate([np_p["bias"], np_d["bias"]])
    if (method == "instance_anchored" and ns_p is not None
            and "anchor" in ns_p):
        anchor = jnp.concatenate(
            [_debiased_anchor(ns_p), _debiased_anchor(ns_d)])
        y, _ = _instance_norm_anchored(
            h, scale, bias, anchor, _NORM_EPS)
    elif method == "instance_fast":
        y = _instance_norm_fast(h, scale, bias, _NORM_EPS)
    else:
        y = _instance_norm(h, scale, bias, _NORM_EPS)
    return y.astype(dtype)


def paired_heads_apply(
    f,
    pp, dp,
    pbs: Optional[dict], dbs: Optional[dict],
    *,
    norm_method: str,
    dtype: Any,
    joints: int,
    mid: str = "separate",     # 'separate' | 'grouped'
    final: str = "blockdiag",  # 'blockdiag' | 'separate'
):
    """Evaluate plane+depth heads from their param subtrees. Returns
    (logits, depthmaps), matching two `_Head` applications exactly up to
    conv summation order (see module docstring)."""
    j = joints
    c = pp["conv_0"]["conv"]["kernel"].shape[-1]

    def K(t, i):
        return t[f"conv_{i}"]["conv"]["kernel"]

    def B(t, i):
        return t[f"conv_{i}"]["conv"]["bias"]

    def NP(t, i):
        return t[f"norm_{i}"]

    def NS(t, i):
        return t.get(f"norm_{i}") if t else None

    w0 = jnp.concatenate([K(pp, 0), K(dp, 0)], axis=-1)
    b0 = jnp.concatenate([B(pp, 0), B(dp, 0)])
    h = _conv(f, w0, b0, dtype=dtype)
    h = _norm_pair(h, NP(pp, 0), NP(dp, 0), NS(pbs, 0), NS(dbs, 0),
                   norm_method, dtype)
    h = jnn.relu(h)

    if mid == "grouped":
        for i in (1, 2):
            wi = jnp.concatenate([K(pp, i), K(dp, i)], axis=-1)
            bi = jnp.concatenate([B(pp, i), B(dp, i)])
            h = _conv(h, wi, bi, groups=2, dtype=dtype)
            h = _norm_pair(h, NP(pp, i), NP(dp, i), NS(pbs, i), NS(dbs, i),
                           norm_method, dtype)
            h = jnn.relu(h)
        hp = hd = None
    else:
        hp, hd = h[..., :c], h[..., c:]
        for i in (1, 2):
            hp = jnn.relu(_norm(_conv(hp, K(pp, i), B(pp, i), dtype=dtype),
                                NP(pp, i), NS(pbs, i), norm_method, dtype))
            hd = jnn.relu(_norm(_conv(hd, K(dp, i), B(dp, i), dtype=dtype),
                                NP(dp, i), NS(dbs, i), norm_method, dtype))

    if final == "blockdiag":
        if hp is not None:
            h = jnp.concatenate([hp, hd], axis=-1)
        kp, kd = K(pp, 3), K(dp, 3)
        zpad = jnp.zeros(kp.shape[:2] + (c, j), kp.dtype)
        w3 = jnp.concatenate([
            jnp.concatenate([kp, zpad], axis=-1),   # in 0:C   -> out 0:J
            jnp.concatenate([zpad, kd], axis=-1),   # in C:2C  -> out J:2J
        ], axis=2)
        b3 = jnp.concatenate([B(pp, 3), B(dp, 3)])
        z = _conv(h, w3, b3, dtype=dtype)
        return z[..., :j], z[..., j:]

    if hp is None:
        hp, hd = h[..., :c], h[..., c:]
    logits = _conv(hp, K(pp, 3), B(pp, 3), dtype=dtype)
    depthmaps = _conv(hd, K(dp, 3), B(dp, 3), dtype=dtype)
    return logits, depthmaps
