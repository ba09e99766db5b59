"""Shared building blocks: torch-compatible Conv, InstanceNorm, norm factory.

Numerics are kept compatible with the reference's torch modules so released
``.pt`` checkpoints can be loaded bit-faithfully (conv padding = explicit
``k//2`` on both sides — torch semantics, *not* XLA 'SAME' — and
InstanceNorm2d with eps=1e-5, biased variance, affine).

Layout is NHWC throughout (TPU-native); the torch->flax converter transposes
conv kernels OIHW -> HWIO.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

# torch nn.init.xavier_normal_: std = sqrt(2 / (fan_in + fan_out)), plain
# normal (not truncated) — reference utils.py:339-342 applies it to every
# Conv2d weight.
xavier_normal = jax.nn.initializers.variance_scaling(1.0, "fan_avg", "normal")


def torch_uniform_init(fan_in: int):
    """torch's default symmetric uniform U(-1/sqrt(fan_in), 1/sqrt(fan_in)):
    Conv2d/Linear bias default, and Linear kaiming-uniform weight (a=sqrt(5))
    collapses to the same bound."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _Int8Conv2D(nn.Module):
    """int8-quantized 2-D conv for the inference path (v5e int8 MXU: 394
    TOPs vs 197 bf16 TFLOP/s; measured 351 vs 182 on this chip = 1.93x).

    Weights: symmetric per-output-channel int8, scales from |W|max (computed
    from the f32 params at apply time — negligible work, and the param tree
    stays byte-identical to the unquantized `Conv`, so any checkpoint loads
    in either mode). Activations: symmetric per-sample dynamic int8 from
    |x|max over (H, W, C) — no calibration pass needed; per-sample scales are
    exact under convolution because convs never mix the batch axis.

    Param names/shapes mirror flax ``nn.Conv`` (kernel HWIO + bias) under the
    same ``conv`` scope.

    Scale modes (the profiler made the trade-off explicit):

    * dynamic (``static_scale=False``): per-sample scales from |x|max on the
      fly. Zero setup, but the abs-max is a *reduction over the activation*
      that cannot fuse with its own consumer — every quantized conv pays an
      extra full read of the input plus a separate quantize pass. On the
      bandwidth-bound stem this costs more than the int8 MXU saves.
    * static (``static_scale=True``): calibrated PER-INPUT-CHANNEL scales
      stored in the ``quant_scales`` collection (running per-channel |x|max
      over every batch run with ``mutable=["quant_scales"]``), folded into
      the weight quantization so they are exact under convolution. The
      quantize is then a pure elementwise chain that fuses into the
      producer's epilogue (the producer writes int8 *instead of* bf16 — the
      conv reads half the bytes), and the int8 MXU win is kept intact.
      `serve.Predictor` and the test CLIs calibrate automatically
      (``--quant_calib_batches``).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    static_scale: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = k // 2
        cin = x.shape[-1]
        fan_in = cin * k * k
        kernel = self.param("kernel", xavier_normal, (k, k, cin, self.features), jnp.float32)
        bias = self.param("bias", torch_uniform_init(fan_in), (self.features,), jnp.float32)

        x32 = x.astype(jnp.float32)
        if self.static_scale:
            # static scales are PER INPUT CHANNEL, calibrated as a running
            # per-channel |x| max over as many batches as the caller runs
            # with mutable=["quant_scales"] (a single batch's scalar absmax
            # let one outlier set the clip range for every channel forever).
            # Per-channel activation scales are exact under convolution by
            # folding them into the weight before ITS quantization:
            #   y = t_o * sum_c (x_c/s_c) * round(w*s_c/t_o)
            sv = self.variable("quant_scales", "act_absmax_c",
                               lambda: jnp.zeros((cin,), jnp.float32))
            if self.is_mutable_collection("quant_scales"):
                sv.value = jnp.maximum(sv.value, jnp.max(jnp.abs(x32), axis=(0, 1, 2)))
            s_a = jnp.maximum(sv.value / 127.0, 1e-12)                  # [Cin]
            w_eff = kernel * s_a[None, None, :, None]
            s_w = jnp.maximum(jnp.max(jnp.abs(w_eff), axis=(0, 1, 2)) / 127.0, 1e-12)
            w_q = jnp.round(w_eff / s_w).astype(jnp.int8)
            s_out = s_w[None, None, None, :]                            # s_a folded
        else:
            s_a = jnp.max(jnp.abs(x32), axis=(1, 2, 3), keepdims=True) / 127.0  # [B,1,1,1]
            s_a = jnp.maximum(s_a, 1e-12)
            s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0, 1e-12)
            w_q = jnp.round(kernel / s_w).astype(jnp.int8)
            s_out = s_a * s_w[None, None, None, :]
        x_q = jnp.clip(jnp.round(x32 / s_a), -127, 127).astype(jnp.int8)
        # CRITICAL (measured on v5e): without this barrier XLA fuses the
        # quantize chain INTO the convolution as a producer — the conv then
        # re-quantizes every input tile on the VPU and runs at bf16 speed
        # (1.95ms vs 0.82ms for the same s8 conv fed from HBM). The barrier
        # materializes x_q; the quantize still fuses backward into the
        # *producer's* epilogue (which then writes s8 instead of bf16).
        x_q = jax.lax.optimization_barrier(x_q)

        y = jax.lax.conv_general_dilated(
            x_q, w_q,
            window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        out = y.astype(jnp.float32) * s_out + bias
        return out.astype(self.dtype)


class Conv(nn.Module):
    """2-D conv with torch-style explicit padding and init.

    ``quant='int8'`` swaps in the int8 MXU path (`_Int8Conv2D`) with an
    identical parameter tree — inference only (round() has zero gradient).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    quant: str | None = None  # None | 'int8' (dynamic) | 'int8_static'

    @nn.compact
    def __call__(self, x):
        if self.quant in ("int8", "int8_static"):
            return _Int8Conv2D(
                features=self.features,
                kernel_size=self.kernel_size,
                stride=self.stride,
                dtype=self.dtype,
                static_scale=self.quant == "int8_static",
                name="conv",
            )(x)
        if self.quant is not None:
            raise ValueError(f"unknown quant mode: {self.quant}")
        k = self.kernel_size
        pad = k // 2
        fan_in = x.shape[-1] * k * k
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_init=xavier_normal,
            bias_init=torch_uniform_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _instance_norm(x, scale, bias, eps):
    """Instance norm core on f32 NHWC with a hand-written backward.

    Forward: TWO-PASS variance ``E[(x-mean)^2]`` (torch semantics — see
    `_instance_norm_fwd` for the measured option space; the one-pass
    ``E[x^2]-E[x]^2`` form cancels catastrophically on near-constant
    channels and lives behind ``fast=True`` / ``--norm_method
    instance_fast``). The affine is folded into one multiply-add.

    Backward (custom): the standard layernorm-style form
        dx = scale*inv * (g - mean(g) - xhat * mean(g*xhat))
    computed with mean(g) and mean(g*xhat) fused into ONE pass over (g, x)
    — jax's autodiff of the forward routes gradients separately through the
    E[x], E[x^2] and affine branches, re-reading the activation multiple
    times. Residuals are x IN ITS ORIGINAL DTYPE (bf16 under mixed
    precision — halves the backward's re-read bandwidth of every
    activation; ~100 norms dominate the flat train-step profile) plus the
    tiny per-(B,C) f32 stats. Inputs may be any float dtype; stats and the
    returned y are f32.
    """
    y, _ = _instance_norm_fwd(x, scale, bias, eps)
    return y


def _comp_sum(x32, axes):
    """Compensated sum over ``axes``: a variadic reduce whose carry is a
    TwoSum (hi, lo) float pair — the running error of every partial add is
    captured in ``lo``, so the result is accurate to ~2^-48 relative
    (double-single precision) using only f32 hardware. Order-insensitive,
    so XLA may reassociate/tile the reduction freely, and it remains an
    ordinary reduce that fuses into its producer like a plain sum."""

    def comb(acc, val):
        h1, l1 = acc
        h2, l2 = val
        s = h1 + h2
        z = s - h1
        e = (h1 - (s - z)) + (h2 - z)  # exact error of the add (TwoSum)
        return s, (l1 + l2) + e

    zero = jnp.zeros((), jnp.float32)
    return jax.lax.reduce(
        (x32, jnp.zeros_like(x32)), (zero, zero), comb, axes
    )


def _two_prod(a):
    """Dekker split square: returns (p, pe) with a*a = p + pe exactly
    (f32-only; the 4097 split yields <=12-bit halves whose products are
    exact in f32)."""
    c = jnp.float32(4097.0) * a
    big = c - (c - a)
    small = a - big
    p = a * a
    pe = ((big * big - p) + 2.0 * big * small) + small * small
    return p, pe


def _instance_norm_fwd_comp(x, scale, bias, eps):
    # COMPENSATED ONE-PASS statistics: two-pass-grade exactness from
    # one-pass reductions. The plain one-pass E[x^2]-E[x]^2 (round 1,
    # 10.3k fps) fails trained parity by ~20 mm because f32 representation
    # + summation of E[x^2] carries ~eps*mean^2 of error (> the 1e-5 norm
    # eps on depth-crop-like channels). This form fixes the NUMERICS:
    #   * Sum(x), Sum(x^2) via TwoSum-carry reduce  -> ~2^-48 relative
    #     (x is bf16-representable, so x^2 is EXACT in f32 per element)
    #   * /N exact (H*W is a power of two for every supported size)
    #   * mean^2 via a Dekker split square (exact product pair)
    #   * E[x^2]-mean^2: the hi parts are within 2x of each other on the
    #     dangerous near-constant channels, so their f32 subtraction is
    #     EXACT (Sterbenz); all residual error rides in the lo terms.
    # (verified against float64 on adversarial channels,
    # tests/test_norm_numerics.py)
    #
    # but NOT the performance: measured on the head-unit chain (v5e),
    # conv+norm+relu is 8.74 us/frame with this form vs 8.05 two-pass and
    # 6.50 plain-one-pass — XLA's convert_reduce_fusion only fuses PLAIN
    # sums into a conv's epilogue, so the variadic TwoSum reduce runs as
    # its own full read of the activation (the same unfused pass two-pass
    # pays for the var) plus ~7 VPU flops/element. Kept as a correctness
    # reference / for backends whose reduce fusion improves.
    x32 = x.astype(jnp.float32)
    n = x.shape[1] * x.shape[2]
    if n & (n - 1) != 0:
        # the exact-/N argument needs n = 2^k (true for every supported
        # size); odd spatial sizes fall back to the literal two-pass form
        return _instance_norm_fwd(x, scale, bias, eps)
    s1h, s1l = _comp_sum(x32, (1, 2))                    # [B, C] pairs
    s2h, s2l = _comp_sum(jnp.square(x32), (1, 2))
    inv_n = jnp.float32(1.0 / n)                         # exact: n = 2^k
    mh, ml = s1h * inv_n, s1l * inv_n
    e2h, e2l = s2h * inv_n, s2l * inv_n
    p, pe = _two_prod(mh)
    var = (e2h - p) + (e2l - (pe + 2.0 * mh * ml))
    var = jnp.maximum(var, 0.0)[:, None, None, :]
    mean = (mh + ml)[:, None, None, :]
    inv = jax.lax.rsqrt(var + eps)
    a = inv * scale
    b = bias - mean * a
    y = x32 * a + b
    return y, (x, mean, inv, scale)


def _instance_norm_fwd(x, scale, bias, eps):
    # THE DEFAULT: two-pass variance E[(x-mean)^2] — torch semantics and
    # numerically robust. The one-pass E[x^2]-E[x]^2 form (round 1) cancels
    # catastrophically on near-constant channels (the trained-checkpoint
    # parity gate measured ~20 mm of drift); the extra activation read it
    # costs (~19% on the stage-1 headline, 10.3k -> 8.3k fps) was attacked
    # in round 3 from every side and MEASURED irreducible on this chip:
    #   * fused Pallas conv+norm units (ops/pallas_fused.py): per-unit VPU
    #     glue (xm build + in-VMEM stats, ~2.3 us serialized against the
    #     MXU) >= the var read they save — 8.4-8.6 vs XLA's 8.05 us/unit;
    #   * merged whole-ResBlock / head-chain kernels: tie at best (11.6 vs
    #     11.2); 128x128 shapes are Pallas-DMA-capped at ~200 GB/s;
    #   * compensated one-pass stats (`_instance_norm_fwd_comp`): exact,
    #     but the TwoSum reduce does not fuse into the conv -> same
    #     unfused pass as two-pass, +VPU cost (8.74);
    #   * anchored one-pass (c = x[:,0,0,:]): slice dependency stops ALL
    #     stat fusion (~6.4k fps end-to-end).
    # `norm_method='instance_fast'` keeps the raw one-pass form for
    # serving paths that accept the parity caveat.
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    a = inv * scale
    b = bias - mean * a
    y = x32 * a + b
    return y, (x, mean, inv, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _instance_norm_anchored(x, scale, bias, anchor, eps):
    """Instance norm with CALIBRATED-ANCHOR one-pass statistics.

    ``var = E[(x-c)^2] - (E[x]-c)^2`` with ``c`` a per-channel CONSTANT
    (a calibrated running mean stored in the ``batch_stats`` collection) —
    an exact algebraic identity, evaluated in f32. Unlike the data-dependent
    anchor slice (c = x[:,0,0,:], measured ~6.4k fps because the slice
    dependency stops all stat fusion), a constant anchor keeps BOTH
    reductions plain sums of elementwise chains, which XLA's
    convert_reduce_fusion folds into the producing conv exactly like the
    raw one-pass form (single activation read).

    Numerics: relative var error ~ eps_f32 * (1 + (mean-c)^2/var). The
    round-1 catastrophic case (c=0: near-constant channels where
    mean^2/var ~ 1e8) becomes benign once c tracks the channel mean within
    a few sigma — the calibration keeps (mean-c)^2 = O(var). Channels the
    anchor has never seen stay no worse than one-pass.

    Returns ``(y, batch_mean[C])`` — the per-channel batch mean falls out
    of the stats already computed, so the caller's anchor calibration costs
    no extra pass over the activation.
    """
    out, _ = _instance_norm_fwd_anchored(x, scale, bias, anchor, eps)
    return out


def _instance_norm_fwd_anchored(x, scale, bias, anchor, eps):
    x32 = x.astype(jnp.float32)
    c = jax.lax.stop_gradient(anchor.astype(jnp.float32))
    xc = x32 - c
    mean_c = jnp.mean(xc, axis=(1, 2), keepdims=True)            # = mean - c
    var = jnp.maximum(
        jnp.mean(jnp.square(xc), axis=(1, 2), keepdims=True)
        - jnp.square(mean_c), 0.0)
    mean = mean_c + c
    inv = jax.lax.rsqrt(var + eps)
    a = inv * scale
    b = bias - mean * a
    y = x32 * a + b
    bmean = jnp.mean(mean, axis=(0, 1, 2))                       # [C], free
    return (y, bmean), (x, mean, inv, scale)


def _instance_norm_bwd_anchored(eps, res, cts):
    g, _g_bmean = cts  # batch_mean is a calibration aux: no gradient
    dx, dscale, dbias = _instance_norm_bwd(eps, res, g)
    # the anchor is a calibration constant (stop_gradient semantics)
    return dx, dscale, dbias, jnp.zeros(res[0].shape[-1], jnp.float32)


def _instance_norm_fwd_fast(x, scale, bias, eps):
    # one-pass E[x]/E[x^2] stats, both fused by XLA into the producing conv
    # (single activation read): the round-1 speed form. See
    # `_instance_norm_fwd` for the robustness caveat.
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    mean_sq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = inv * scale
    b = bias - mean * a
    y = x32 * a + b
    return y, (x, mean, inv, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _instance_norm_fast(x, scale, bias, eps):
    y, _ = _instance_norm_fwd_fast(x, scale, bias, eps)
    return y


def _instance_norm_bwd(eps, res, g):
    x, mean, inv, scale = res
    x32 = x.astype(jnp.float32)
    xhat = (x32 - mean) * inv
    mg = jnp.mean(g, axis=(1, 2), keepdims=True)
    mgx = jnp.mean(g * xhat, axis=(1, 2), keepdims=True)
    # cotangent dtype must match the primal x (bf16 under mixed precision —
    # the consuming conv-backward casts to bf16 for the MXU anyway)
    dx = ((inv * scale) * (g - mg - xhat * mgx)).astype(x.dtype)
    dscale = jnp.sum(g * xhat, axis=(0, 1, 2))
    dbias = jnp.sum(g, axis=(0, 1, 2))
    return dx, dscale, dbias


_instance_norm.defvjp(_instance_norm_fwd, _instance_norm_bwd)
_instance_norm_fast.defvjp(_instance_norm_fwd_fast, _instance_norm_bwd)
_instance_norm_anchored.defvjp(_instance_norm_fwd_anchored,
                               _instance_norm_bwd_anchored)


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d(affine=True): per-sample per-channel over H, W.

    Stateless (no running stats — torch default track_running_stats=False),
    eps=1e-5, biased variance. Statistics are computed in float32 regardless
    of activation dtype. Backward is a custom VJP (see `_instance_norm`).
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    fast: bool = False  # one-pass stats (see _instance_norm_fwd_fast caveat)
    anchored: bool = False  # calibrated-anchor one-pass (see _instance_norm_anchored)
    anchor_momentum: float = 0.9

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # pass x in its native dtype: the custom VJP stores it as the
        # residual, so bf16 activations are re-read at half the bandwidth
        # on the backward pass
        if self.anchored and (
            self.is_initializing() or self.has_variable("batch_stats", "anchor")
        ):
            # per-channel calibration anchor in batch_stats (same collection
            # BatchNorm uses, so the train loop / checkpoints / CLIs thread
            # it with zero extra plumbing). Torch-converted checkpoints have
            # no batch_stats -> the has_variable branch above falls back to
            # exact two-pass statistics transparently.
            # debiased EMA (Adam-style): anchor = ema / (1 - m^n). A plain
            # EMA from zero keeps m^n of the true mean as bias — 20
            # calibration steps at m=0.9 still leave 12% of the mean, which
            # re-introduces the (mean-c)^2 cancellation on near-constant
            # channels. Debiasing makes few-batch calibration exact on a
            # stationary distribution; n=0 (fresh init) degrades to the
            # plain one-pass form, which is fine pre-training.
            ema = self.variable("batch_stats", "anchor",
                                lambda: jnp.zeros((c,), jnp.float32))
            n = self.variable("batch_stats", "anchor_n",
                              lambda: jnp.zeros((), jnp.float32))
            m = jnp.float32(self.anchor_momentum)
            debias = 1.0 - jnp.power(m, n.value)
            anchor = jnp.where(debias > 0, ema.value / jnp.maximum(debias, 1e-12), 0.0)
            y, bmean = _instance_norm_anchored(x, scale, bias, anchor,
                                               self.epsilon)
            if (not self.is_initializing()
                    and self.is_mutable_collection("batch_stats")):
                ema.value = m * ema.value + (1.0 - m) * bmean
                n.value = n.value + 1.0
            return y.astype(self.dtype)
        fn = _instance_norm_fast if self.fast else _instance_norm
        y = fn(x, scale, bias, self.epsilon)
        return y.astype(self.dtype)


def make_norm(method: str, dtype: Any = jnp.float32) -> Callable[..., nn.Module]:
    """Factory matching the reference's norm selection (model.py:157-160).

    ``instance_fast`` = InstanceNorm with one-pass statistics: ~19% faster
    end-to-end (both stat reductions fuse into the producing conv) but
    numerically unsafe on near-constant channels — serving opt-in, not for
    checkpoint-parity work.

    ``instance_anchored`` = calibrated-anchor one-pass statistics
    (`_instance_norm_anchored`): one-pass fusion/speed with two-pass-grade
    robustness once the per-channel anchors (batch_stats) are calibrated;
    falls back to exact two-pass for checkpoints without anchors."""
    if method == "instance":
        return functools.partial(InstanceNorm, dtype=dtype)
    if method == "instance_fast":
        return functools.partial(InstanceNorm, dtype=dtype, fast=True)
    if method == "instance_anchored":
        return functools.partial(InstanceNorm, dtype=dtype, anchored=True)
    if method == "batch":
        return functools.partial(
            nn.BatchNorm,
            epsilon=1e-5,
            momentum=0.9,  # torch momentum 0.1 == flax momentum 0.9
            dtype=dtype,
            param_dtype=jnp.float32,
        )
    raise ValueError(f"unknown norm method: {method}")


def apply_norm(norm_mod: nn.Module, x, train: bool):
    """Apply a norm module, threading the train flag for BatchNorm."""
    if isinstance(norm_mod, nn.BatchNorm):
        return norm_mod(x, use_running_average=not train)
    return norm_mod(x)


def max_pool_2x2(x):
    """torch MaxPool2d(2, stride=2) on NHWC."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def upsample_nearest_2x_add(h, x):
    """Nearest 2x upsample of ``h`` plus skip ``x`` in one fused pass —
    bit-identical to ``repeat(h, 2, axis=1).repeat(2, axis=2) + x``, i.e.
    torch ``F.interpolate(mode='nearest')`` (reference model.py:45 —
    hourglass sizes are exact powers of two) followed by the skip add.

    The repeat form materializes the upsampled tensor as standalone
    broadcast_in_dim ops before the skip add (profiled ~3.8 us/frame per
    hourglass at the 64² level). Keeping the add in the compact domain —
    skip reshaped to [B,H,2,W,2,C], low-res operand broadcast over the
    inserted axes — lets XLA emit one fused read-h/read-x/write pass:
    measured 6.12 vs 7.35 us/frame at [256,32→64,128] bf16
    (tools/bench_upsample_add.py)."""
    b, hh, ww, c = h.shape
    xr = x.reshape(b, hh, 2, ww, 2, c)
    y = xr + h[:, :, None, :, None, :]
    return y.reshape(b, 2 * hh, 2 * ww, c)
