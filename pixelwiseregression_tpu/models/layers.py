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


class Conv(nn.Module):
    """2-D conv with torch-style explicit padding and init."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
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
