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
    * static (``static_scale=True``): one calibrated per-tensor scale stored
      in the ``quant_scales`` collection. The quantize is then a pure
      elementwise chain that fuses into the producer's epilogue (the producer
      writes int8 *instead of* bf16 — the conv reads half the bytes), and the
      int8 MXU win is kept intact. Calibrate by running representative
      batches with ``mutable=["quant_scales"]`` (tracks running |x|max), then
      freeze. `serve.Predictor` and the test CLIs do this automatically.
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

        s_w = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0          # [Cout]
        s_w = jnp.maximum(s_w, 1e-12)
        w_q = jnp.round(kernel / s_w).astype(jnp.int8)

        x32 = x.astype(jnp.float32)
        if self.static_scale:
            sv = self.variable("quant_scales", "act_absmax",
                               lambda: jnp.zeros((), jnp.float32))
            if self.is_mutable_collection("quant_scales"):
                sv.value = jnp.maximum(sv.value, jnp.max(jnp.abs(x32)))
            s_a = jnp.maximum(sv.value / 127.0, 1e-12)                  # scalar
        else:
            s_a = jnp.max(jnp.abs(x32), axis=(1, 2, 3), keepdims=True) / 127.0  # [B,1,1,1]
            s_a = jnp.maximum(s_a, 1e-12)
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
        out = y.astype(jnp.float32) * (s_a * s_w[None, None, None, :]) + bias
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
def _instance_norm(x32, scale, bias, eps):
    """Instance norm core on f32 NHWC with a hand-written backward.

    Forward: one-pass stats — E[x] and E[x^2] come out of a single read of
    the activation (XLA fuses both reductions into the producing conv);
    var = E[x^2] - E[x]^2 is accurate enough in f32 for O(1)-scale
    activations. The affine is folded into one multiply-add.

    Backward (custom): the standard layernorm-style form
        dx = scale*inv * (g - mean(g) - xhat * mean(g*xhat))
    computed with mean(g) and mean(g*xhat) fused into ONE pass over (g, x)
    — jax's autodiff of the forward routes gradients separately through the
    E[x], E[x^2] and affine branches, re-reading the activation multiple
    times. Residuals are x plus the tiny per-(B,C) stats.
    """
    y, _ = _instance_norm_fwd(x32, scale, bias, eps)
    return y


def _instance_norm_fwd(x32, scale, bias, eps):
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    mean_sq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = inv * scale
    b = bias - mean * a
    y = x32 * a + b
    return y, (x32, mean, inv, scale)


def _instance_norm_bwd(eps, res, g):
    x32, mean, inv, scale = res
    xhat = (x32 - mean) * inv
    mg = jnp.mean(g, axis=(1, 2), keepdims=True)
    mgx = jnp.mean(g * xhat, axis=(1, 2), keepdims=True)
    dx = (inv * scale) * (g - mg - xhat * mgx)
    dscale = jnp.sum(g * xhat, axis=(0, 1, 2))
    dbias = jnp.sum(g, axis=(0, 1, 2))
    return dx, dscale, dbias


_instance_norm.defvjp(_instance_norm_fwd, _instance_norm_bwd)


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d(affine=True): per-sample per-channel over H, W.

    Stateless (no running stats — torch default track_running_stats=False),
    eps=1e-5, biased variance. Statistics are computed in float32 regardless
    of activation dtype. Backward is a custom VJP (see `_instance_norm`).
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        y = _instance_norm(x.astype(jnp.float32), scale, bias, self.epsilon)
        return y.astype(self.dtype)


def make_norm(method: str, dtype: Any = jnp.float32) -> Callable[..., nn.Module]:
    """Factory matching the reference's norm selection (model.py:157-160)."""
    if method == "instance":
        return functools.partial(InstanceNorm, dtype=dtype)
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


def upsample_nearest_2x(x):
    """torch F.interpolate(mode='nearest') for an exact 2x upsample
    (reference: model.py:45 — hourglass sizes are exact powers of two)."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x
