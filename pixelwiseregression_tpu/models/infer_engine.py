"""Fused inference engine for `PixelwiseRegression`.

Serving-path forward that consumes the SAME variables pytree as
``model.apply`` but schedules the computation for the TPU memory system:
the entire hourglass of every stage runs as one VMEM-resident Pallas kernel
(`ops.pallas_hourglass`), eliminating the per-ResBlock HBM round-trips that
profiling showed cost ~30 us/frame on the 2-stage flagship. Stem, heads and
the soft-argmax decoder keep their XLA forms (the head convs already run at
~98% MXU utilization).

Semantics are golden-tested against ``model.apply(..., train=False)``
(tests/test_infer_engine.py): same stage structure (reference:
model.py:153-210), same instance-norm/softmax numerics.

Measured end-to-end (same-process A/B, stage-2 flagship, batch 256):
the engine matches the XLA path (4,034 vs 4,050 fps on the throttled
chip) at hourglass_block_batch=4 — the pipeline hides most of the
kernel's standalone deficit; block_batch=8 compiles standalone but OOMs
VMEM inside the full jit. Parity means it ships experimental: it is the
vehicle for future kernel-level wins, not yet a speedup.

CLOSE-OUT (round 3): both engines are RETIRED from the serving path and
kept only as measurement substrates (`bench.py --engine fused|unit`,
golden tests). The whole-hourglass kernel never beat XLA (33.9 vs 23.3
us/frame standalone; e2e tie at best — PERF.md), the per-unit fused-conv
engine loses chained (8.4-8.6 vs 8.05 us/unit), and the round-3
calibrated-anchor norm removed the var-pass read that was their reason to
exist: the XLA path now runs one-pass stats fused into the producing
convs, which neither kernel can beat at these shapes (XLA's conv is ~97%
of MXU peak; Pallas per-unit glue >= the traffic it saves). The shipped
serving path is `model.apply` (anchored norm, pallas decoder).

Supported configs: instance norm, no quantization (the int8 path's conv
epilogues are a different schedule). `make_fused_apply` raises for
unsupported configs; callers (bench/serve/test CLI) fall back to
``model.apply``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.models.layers import (
    _instance_norm,
    max_pool_2x2,
    upsample_nearest_2x_add,
)
from pixelwiseregression_tpu.ops.pallas_hourglass import (
    hourglass_fused,
    stack_hourglass_params,
)
from pixelwiseregression_tpu.ops.softargmax import soft_argmax_decode


def _conv(x, p, *, stride: int = 1, dtype):
    """Mirror of models.layers.Conv's nn.Conv emission: torch-style explicit
    k//2 padding, inputs/kernel cast to the activation dtype."""
    kernel = p["kernel"].astype(dtype)
    k = kernel.shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(dtype)


def _inorm_relu(x, p, dtype):
    y = _instance_norm(x.astype(jnp.float32), p["scale"], p["bias"], 1e-5)
    return jnp.maximum(y, 0.0).astype(dtype)


def _head(x, p, dtype):
    """4-conv regression head (reference: model.py:54-65, 103-114)."""
    for i in range(3):
        x = _conv(x, p[f"conv_{i}"]["conv"], dtype=dtype)
        x = _inorm_relu(x, p[f"norm_{i}"], dtype)
    return _conv(x, p["conv_3"]["conv"], dtype=dtype)


def make_unit_fused_apply(model, variables, *, min_res: int = 32,
                          interpret: bool | None = None):
    """Forward equivalent to ``model.apply(..., train=False)`` with every
    conv+instance-norm pair fused into one Pallas unit
    (`ops.pallas_fused.fused_conv_norm`), eliminating the two-pass
    variance's extra HBM read of every activation (PERF.md round 3).

    Coverage (see ops/pallas_fused.py for the kernel):
      * stem: conv_0 stays XLA (1-channel input); conv_1 fuses norm_0 as
        prologue + norm_1 as epilogue; later stride-1 convs fuse their
        epilogue norm; the stride-2 conv + final norm stay XLA.
      * hourglass ResBlocks at resolution >= ``min_res``: three prologue
        units, the last with the residual add folded in. Below min_res the
        XLA path runs (traffic there is negligible; tiny-block kernels are
        launch-overhead-bound — the round-2 whole-hourglass lesson).
      * heads: conv_0..2 fuse their epilogue norms; conv_3 stays XLA (its
        logits feed the decoder unchanged).

    Consumes the same variables pytree as ``model.apply``; golden-tested in
    tests/test_infer_engine.py.
    """
    from pixelwiseregression_tpu.ops.pallas_fused import fused_conv_norm

    if model.norm_method != "instance":
        raise ValueError("unit-fused engine supports instance norm only")
    if model.quant:
        raise ValueError("unit-fused engine does not support quantized models")
    if model.kernel_size != 3:
        raise ValueError("unit-fused engine supports kernel_size=3 only")

    params = jax.tree.map(np.asarray, variables["params"])
    dtype = model.dtype
    level = model.level

    n_stem = 0
    while f"stem_conv_{n_stem}" in params:
        n_stem += 1

    def unit(x, cp, pro=None, epi=None, skip=None):
        return fused_conv_norm(
            x, jnp.asarray(cp["kernel"]), jnp.asarray(cp["bias"]),
            pro_scale=None if pro is None else jnp.asarray(pro["scale"]),
            pro_bias=None if pro is None else jnp.asarray(pro["bias"]),
            epi_scale=None if epi is None else jnp.asarray(epi["scale"]),
            epi_bias=None if epi is None else jnp.asarray(epi["bias"]),
            skip=skip, interpret=interpret,
        )

    def resblock_xla(x, p):
        h = _inorm_relu(x, p["norm_0"], dtype)
        h = _conv(h, p["conv_0"]["conv"], dtype=dtype)
        h = _inorm_relu(h, p["norm_1"], dtype)
        h = _conv(h, p["conv_1"]["conv"], dtype=dtype)
        h = _inorm_relu(h, p["norm_2"], dtype)
        h = _conv(h, p["conv_2"]["conv"], dtype=dtype)
        return x + h

    def resblock(x, p):
        if x.shape[1] < min_res:
            return resblock_xla(x, p)
        h = unit(x, p["conv_0"]["conv"], pro=p["norm_0"])
        h = unit(h, p["conv_1"]["conv"], pro=p["norm_1"])
        return unit(h, p["conv_2"]["conv"], pro=p["norm_2"], skip=x)

    def hourglass(x, p, lvl):
        x1 = resblock(x, p["input_conv"])
        h = max_pool_2x2(x1)
        if lvl > 0:
            h = hourglass(h, p["inner"], lvl - 1)
        else:
            h = resblock(h, p["inner"])
        h = resblock(h, p["output_conv"])
        return upsample_nearest_2x_add(h, x1)

    def head(x, p):
        for i in range(3):
            x = unit(x, p[f"conv_{i}"]["conv"], epi=p[f"norm_{i}"])
        return _conv(x, p["conv_3"]["conv"], dtype=dtype)

    def fn(img, label_img, mask):
        x = img.astype(dtype)
        label = label_img.astype(dtype)
        mask_c = mask.astype(dtype)

        # stem (reference model.py:164-187): conv_0 XLA; its norm rides as
        # the prologue of the conv_1 unit when one exists
        x = _conv(x, params["stem_conv_0"]["conv"], dtype=dtype)
        if n_stem >= 3:
            x = unit(x, params["stem_conv_1"]["conv"],
                     pro=params["stem_norm_0"], epi=params["stem_norm_1"])
            for i in range(2, n_stem - 1):
                x = unit(x, params[f"stem_conv_{i}"]["conv"],
                         epi=params[f"stem_norm_{i}"])
        else:
            x = _inorm_relu(x, params["stem_norm_0"], dtype)
        i = n_stem - 1
        x = _conv(x, params[f"stem_conv_{i}"]["conv"], stride=2, dtype=dtype)
        x = _inorm_relu(x, params[f"stem_norm_{i}"], dtype)

        results = []
        f = x
        for s in range(model.stage):
            sp = params[f"stage_{s}"]
            h = _conv(f, sp["proj"]["conv"], dtype=dtype)
            h = hourglass(h, sp["hourglass"], level)
            logits = head(h, sp["plane"])
            depthmaps = head(h, sp["depth"])
            w = sp["w"][:, 0] if model.heatmap_method == "softmax" else None
            if model.decoder == "pallas":
                from pixelwiseregression_tpu.ops.pallas_softargmax import (
                    soft_argmax_decode_pallas,
                )

                heatmaps, uvd = soft_argmax_decode_pallas(
                    logits, depthmaps, label, mask_c, w, model.heatmap_method
                )
            else:
                heatmaps, uvd = soft_argmax_decode(
                    logits, depthmaps, label, mask_c, w, model.heatmap_method
                )
            results.append((heatmaps, depthmaps, uvd))
            f = jnp.concatenate(
                [heatmaps.astype(dtype), depthmaps.astype(dtype), label],
                axis=-1,
            )
        return results

    return fn


def make_fused_apply(model, variables, *, hourglass_block_batch: int = 4):
    """Build ``fn(img, label_img, mask) -> [(heatmaps, depthmaps, uvd)]``
    equivalent to ``model.apply(variables, ..., train=False)`` with the
    hourglasses fused. The stacked hourglass weights are precomputed here
    (host-side, once) and closed over as ordinary jit constants."""
    if model.norm_method != "instance":
        raise ValueError("fused engine supports instance norm only")
    if model.quant:
        raise ValueError("fused engine does not support quantized models")

    params = jax.tree.map(np.asarray, variables["params"])
    dtype = model.dtype
    level = model.level

    n_stem = 0
    while f"stem_conv_{n_stem}" in params:
        n_stem += 1

    stage_stacked = [
        stack_hourglass_params(params[f"stage_{s}"]["hourglass"], level)
        for s in range(model.stage)
    ]

    def fn(img, label_img, mask):
        x = img.astype(dtype)
        label = label_img.astype(dtype)
        mask_c = mask.astype(dtype)

        for i in range(n_stem):
            stride = 2 if i == n_stem - 1 else 1
            x = _conv(x, params[f"stem_conv_{i}"]["conv"], stride=stride, dtype=dtype)
            x = _inorm_relu(x, params[f"stem_norm_{i}"], dtype)

        results = []
        f = x
        for s in range(model.stage):
            sp = params[f"stage_{s}"]
            h = _conv(f, sp["proj"]["conv"], dtype=dtype)
            h = hourglass_fused(
                h, stage_stacked[s], level, block_batch=hourglass_block_batch
            )
            logits = _head(h, sp["plane"], dtype)
            depthmaps = _head(h, sp["depth"], dtype)
            w = sp["w"][:, 0] if model.heatmap_method == "softmax" else None
            if model.decoder == "pallas":
                from pixelwiseregression_tpu.ops.pallas_softargmax import (
                    soft_argmax_decode_pallas,
                )

                heatmaps, uvd = soft_argmax_decode_pallas(
                    logits, depthmaps, label, mask_c, w, model.heatmap_method
                )
            else:
                heatmaps, uvd = soft_argmax_decode(
                    logits, depthmaps, label, mask_c, w, model.heatmap_method
                )
            results.append((heatmaps, depthmaps, uvd))
            f = jnp.concatenate(
                [heatmaps.astype(dtype), depthmaps.astype(dtype), label],
                axis=-1,
            )
        return results

    return fn
