"""PixelwiseRegression — stacked-hourglass network with soft-argmax decoding.

TPU-native re-design of the reference model (reference: model.py:6-210):
same computation graph (so released checkpoints convert 1:1) but NHWC layout,
float32 params with an optional bf16 activation policy, and the differentiable
decoder factored out so it can run either as plain XLA or as the fused Pallas
reduction kernel.

Structure (reference line refs):
  ResBlock            model.py:6-23    pre-activation bottleneck residual
  Hourglass           model.py:25-47   recursive encoder/decoder, +skip
  PlaneRegression     model.py:49-97   4-conv head -> heatmap logits
  DepthRegression     model.py:99-132  4-conv head -> depth residual maps
  PredictionBlock     model.py:134-151 1x1 proj -> hourglass -> two heads
  PixelwiseRegression model.py:153-210 stem + chained stages (concat 2J+1)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from pixelwiseregression_tpu.models.layers import (
    Conv,
    apply_norm,
    make_norm,
    max_pool_2x2,
    upsample_nearest_2x_add,
)
from pixelwiseregression_tpu.ops.softargmax import soft_argmax_decode


def parse_quant(quant: str | None):
    """Parse a quant mode string ``int8[_static][_all|_heads]`` into the
    per-region Conv modes (stem, heads, hourglass).

    Coverage: default = stem + head conv_0..2 (the FLOP-dense convs);
    ``_all`` additionally quantizes the hourglass ResBlocks; ``_heads``
    restricts to the heads (the stem at 128x128 is bandwidth-bound — int8
    only pays there with static scales, see `_Int8Conv2D`).
    """
    if quant in (None, "none"):
        return None, None, None
    m = quant
    if m.endswith("_all"):
        cov, m = "all", m[: -len("_all")]
    elif m.endswith("_heads"):
        cov, m = "heads", m[: -len("_heads")]
    else:
        cov = "default"
    if m not in ("int8", "int8_static"):
        raise ValueError(f"unknown quant mode: {quant}")
    head_q = m
    stem_q = m if cov in ("default", "all") else None
    hg_q = m if cov == "all" else None
    return stem_q, head_q, hg_q


class ResBlock(nn.Module):
    features: int
    kernel_size: int = 3
    norm_method: str = "instance"
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = make_norm(self.norm_method, self.dtype)
        f = self.features
        h = apply_norm(norm(name="norm_0"), x, train)
        h = nn.relu(h)
        h = Conv(f // 2, 1, dtype=self.dtype, quant=self.quant, name="conv_0")(h)
        h = apply_norm(norm(name="norm_1"), h, train)
        h = nn.relu(h)
        h = Conv(f // 2, self.kernel_size, dtype=self.dtype, quant=self.quant, name="conv_1")(h)
        h = apply_norm(norm(name="norm_2"), h, train)
        h = nn.relu(h)
        h = Conv(f, 1, dtype=self.dtype, quant=self.quant, name="conv_2")(h)
        return x + h


class Hourglass(nn.Module):
    features: int
    level: int = 4
    kernel_size: int = 3
    norm_method: str = "instance"
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(
            features=self.features,
            kernel_size=self.kernel_size,
            norm_method=self.norm_method,
            dtype=self.dtype,
            quant=self.quant,
        )
        x = ResBlock(**kw, name="input_conv")(x, train)
        h = max_pool_2x2(x)
        if self.level > 0:
            h = Hourglass(level=self.level - 1, **kw, name="inner")(h, train)
        else:
            h = ResBlock(**kw, name="inner")(h, train)
        h = ResBlock(**kw, name="output_conv")(h, train)
        return upsample_nearest_2x_add(h, x)


class _Head(nn.Module):
    """Shared 4-conv head used by both regression branches
    (reference: model.py:54-65 and model.py:103-114)."""

    features: int
    out_features: int
    kernel_size: int = 3
    norm_method: str = "instance"
    dtype: Any = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = make_norm(self.norm_method, self.dtype)
        for i in range(3):
            # conv_0..2 carry ~97% of the head FLOPs and are int8-safe; the
            # output conv_3 stays full precision — its logits feed a learned-
            # temperature softmax, the numerically sensitive spot.
            x = Conv(self.features, self.kernel_size, dtype=self.dtype, quant=self.quant, name=f"conv_{i}")(x)
            x = apply_norm(norm(name=f"norm_{i}"), x, train)
            x = nn.relu(x)
        return Conv(self.out_features, self.kernel_size, dtype=self.dtype, name="conv_3")(x)


class PredictionBlock(nn.Module):
    joints: int
    label_size: int = 64
    features: int = 256
    level: int = 4
    kernel_size: int = 3
    norm_method: str = "instance"
    heatmap_method: str = "softmax"
    decoder: str = "xla"  # 'xla' | 'pallas'
    dtype: Any = jnp.float32
    quant: str | None = None  # None | 'int8' (stem+heads) | 'int8_all' (+hourglass)
    # Inference-only fused evaluation of the two heads (exact up to conv
    # summation order, same param tree — see models/paired_heads.py).
    # MEASURED AND REJECTED as a default (v5e, interleaved same-process A/B,
    # tools/bench_paired_model.py --twice): every strategy loses to the
    # plain per-head graph — the channel slice after the merged conv_0
    # stops XLA fusing the norm+relu into the consuming convs (the same
    # slice-kills-fusion failure as round 2's data-anchored norm), and the
    # block-diagonal conv_3 costs ~6 us/frame more despite identical MXU
    # pass counts. Kept as a first-class config for future toolchains.
    paired_heads: bool = False
    paired_mid: str = "separate"     # conv_1/2: 'separate' | 'grouped'
    paired_final: str = "separate"   # conv_3:   'blockdiag' | 'separate'

    @nn.compact
    def __call__(self, x, label_img, mask, train: bool = False):
        _, head_quant, hg_quant = parse_quant(self.quant)
        # proj stays full precision: for stages >= 1 its input is the 2J+1
        # concat of softmax heatmaps (tiny dynamic range) — and it is cheap.
        f = Conv(self.features, 1, dtype=self.dtype, name="proj")(x)
        # NOTE: the reference hourglass always uses its default kernel_size=3
        # (model.py:139 passes no kernel_size), independent of --filter_size.
        f = Hourglass(
            features=self.features,
            level=self.level,
            kernel_size=3,
            norm_method=self.norm_method,
            dtype=self.dtype,
            quant=hg_quant,
            name="hourglass",
        )(f, train)

        use_paired = (
            self.paired_heads
            and not train
            and not self.is_initializing()
            and head_quant is None
            and self.norm_method in ("instance", "instance_fast",
                                     "instance_anchored")
            and self.has_variable("params", "plane")
        )
        if use_paired:
            from pixelwiseregression_tpu.models.paired_heads import (
                paired_heads_apply,
            )

            has_bs = self.has_variable("batch_stats", "plane")
            logits, depthmaps = paired_heads_apply(
                f,
                self.get_variable("params", "plane"),
                self.get_variable("params", "depth"),
                self.get_variable("batch_stats", "plane") if has_bs else None,
                self.get_variable("batch_stats", "depth") if has_bs else None,
                norm_method=self.norm_method,
                dtype=self.dtype,
                joints=self.joints,
                mid=self.paired_mid,
                final=self.paired_final,
            )
        else:
            logits = _Head(
                self.features,
                self.joints,
                self.kernel_size,
                self.norm_method,
                self.dtype,
                head_quant,
                name="plane",
            )(f, train)
            depthmaps = _Head(
                self.features,
                self.joints,
                self.kernel_size,
                self.norm_method,
                self.dtype,
                head_quant,
                name="depth",
            )(f, train)

        if self.heatmap_method == "softmax":
            w = self.param("w", nn.initializers.ones, (self.joints, 1), jnp.float32)
            w = w[:, 0]
        else:
            w = None

        if self.decoder == "pallas":
            from pixelwiseregression_tpu.ops.pallas_softargmax import (
                soft_argmax_decode_pallas,
            )

            heatmaps, uvd = soft_argmax_decode_pallas(
                logits, depthmaps, label_img, mask, w, self.heatmap_method,
                # inference: relayout the decoder boundary in the native
                # (bf16) map dtype — no backward runs, so the f32 custom-VJP
                # path is training-only
                fast_boundary=(not train) and logits.dtype == jnp.bfloat16,
            )
        else:
            heatmaps, uvd = soft_argmax_decode(
                logits, depthmaps, label_img, mask, w, self.heatmap_method
            )
        return heatmaps, depthmaps, uvd


class PixelwiseRegression(nn.Module):
    """Flagship model. Returns a list of per-stage (heatmaps, depthmaps, uvd).

    Maps are NHWC: img ``[B, 2S, 2S, 1]``, label_img/mask ``[B, S, S, 1]``,
    heatmaps/depthmaps ``[B, S, S, J]``, uvd ``[B, J, 3]``.
    """

    joints: int
    stage: int = 2
    label_size: int = 64
    features: int = 256
    level: int = 4
    kernel_size: int = 3
    norm_method: str = "instance"
    heatmap_method: str = "softmax"
    decoder: str = "xla"
    # rematerialize each PredictionBlock on the backward pass: trades ~1.5x
    # stage FLOPs for O(stage) less activation memory — enables pod-scale
    # per-chip batch sizes
    remat: bool = False
    dtype: Any = jnp.float32
    # int8 inference quantization (v5e int8 MXU is 2x bf16 peak). Mode
    # string: ``int8[_static][_all|_heads]`` — see `parse_quant` for the
    # coverage grammar and `_Int8Conv2D` for dynamic vs static scales.
    # The parameter tree is identical to the unquantized model, so the same
    # checkpoint serves every mode ('_static' additionally carries a
    # calibrated ``quant_scales`` collection). Inference only.
    quant: str | None = None
    # Fused plane+depth head evaluation at inference (exact up to conv
    # summation order; see models/paired_heads.py). Measured slower than
    # the plain per-head graph on v5e (slice-kills-fusion; see
    # PredictionBlock) — off by default, kept as a first-class A/B config.
    paired_heads: bool = False
    paired_mid: str = "separate"
    paired_final: str = "separate"

    @nn.compact
    def __call__(self, img, label_img, mask, train: bool = False):
        if train and self.quant:
            raise ValueError(
                "quant is an inference-only path (round() kills gradients); "
                "train with quant=None and quantize at serving time"
            )
        norm = make_norm(self.norm_method, self.dtype)
        x = img.astype(self.dtype)
        label_img = label_img.astype(self.dtype)
        mask_c = mask.astype(self.dtype)

        # Stem: 1->32, feature-doubling 3x3 convs up to `features`, then a
        # stride-2 conv halving spatial size (reference: model.py:164-187).
        widths = [32]
        while widths[-1] < self.features:
            widths.append(min(2 * widths[-1], self.features))
        stem_quant, _, _ = parse_quant(self.quant)
        i = 0
        for w_ in widths:
            # the first conv reads the 1-channel depth image: nothing to
            # gain from int8 there (K=9 contraction, bandwidth-bound)
            q = stem_quant if i > 0 else None
            x = Conv(w_, self.kernel_size, dtype=self.dtype, quant=q, name=f"stem_conv_{i}")(x)
            x = apply_norm(norm(name=f"stem_norm_{i}"), x, train)
            x = nn.relu(x)
            i += 1
        x = Conv(self.features, self.kernel_size, stride=2, dtype=self.dtype, quant=stem_quant, name=f"stem_conv_{i}")(x)
        x = apply_norm(norm(name=f"stem_norm_{i}"), x, train)
        x = nn.relu(x)

        results = []
        f = x
        block_cls = nn.remat(PredictionBlock, static_argnums=(4,)) if self.remat else PredictionBlock
        for s in range(self.stage):
            heatmaps, depthmaps, uvd = block_cls(
                joints=self.joints,
                label_size=self.label_size,
                features=self.features,
                level=self.level,
                kernel_size=self.kernel_size,
                norm_method=self.norm_method,
                heatmap_method=self.heatmap_method,
                decoder=self.decoder,
                dtype=self.dtype,
                quant=self.quant,
                paired_heads=self.paired_heads,
                paired_mid=self.paired_mid,
                paired_final=self.paired_final,
                name=f"stage_{s}",
            )(f, label_img, mask_c, train)
            results.append((heatmaps, depthmaps, uvd))
            # Next-stage input: concat(heatmaps, depthmaps, label_img) along
            # channels -> 2J+1 (reference: model.py:190-193, 208).
            f = jnp.concatenate(
                [heatmaps.astype(self.dtype), depthmaps.astype(self.dtype), label_img],
                axis=-1,
            )
        return results
