"""Differentiable soft-argmax decoder — XLA reference implementation.

Decodes per-joint heatmap logits + depth residual maps into (u, v, d) joint
coordinates (reference: model.py:76-97 and model.py:116-132):

* plane: normalize the heatmap (learned-temperature softmax over H*W, or
  relu-sum), then reduce against fixed centered-coordinate filters,
* depth: masked expectation of ``depthmap + label_img`` under the masked
  heatmap.

This is the semantic ground truth that the fused Pallas kernel
(`pixelwiseregression_tpu.ops.pallas_softargmax`) must match. All reductions
run in float32 regardless of activation dtype.

Layout note: this framework is NHWC end-to-end (TPU-friendly); the reference
is NCHW. Maps are ``[B, H, W, J]``, scalars-per-joint are ``[B, J]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.ops.heatmap import com_filter


def normalize_heatmaps(logits: jax.Array, w: jax.Array | None, method: str = "softmax") -> jax.Array:
    """Heatmap normalization (reference: model.py:81-90).

    Args:
      logits: ``[B, H, W, J]`` raw heatmap logits.
      w: ``[J]`` learned per-joint softmax temperature (softmax method only).
      method: ``'softmax'`` or ``'sum'``.
    """
    b, h, wd, j = logits.shape
    x = logits.astype(jnp.float32)
    if method == "softmax":
        z = x * w.astype(jnp.float32)[None, None, None, :]
        z = z.reshape(b, h * wd, j)
        z = jax.nn.softmax(z, axis=1)
        return z.reshape(b, h, wd, j)
    elif method == "sum":
        z = jax.nn.relu(x) + 1e-14
        return z / jnp.sum(z, axis=(1, 2), keepdims=True)
    raise ValueError(f"unknown normalization method: {method}")


def soft_argmax_decode(
    logits: jax.Array,
    depthmaps: jax.Array,
    label_img: jax.Array,
    mask: jax.Array,
    w: jax.Array | None,
    method: str = "softmax",
):
    """Full decode: logits+depthmaps -> (normalized heatmaps, uvd).

    Args:
      logits: ``[B, H, W, J]`` heatmap logits.
      depthmaps: ``[B, H, W, J]`` depth residual maps.
      label_img: ``[B, H, W, 1]`` normalized COM-centered depth label image.
      mask: ``[B, H, W, 1]`` hand mask.
      w: ``[J]`` softmax temperature (or None for ``method='sum'``).
      method: heatmap normalization method.

    Returns:
      heatmaps ``[B, H, W, J]`` (normalized, float32) and uvd ``[B, J, 3]``.
    """
    b, h, wd, j = logits.shape
    heatmaps = normalize_heatmaps(logits, w, method)

    filt = jnp.asarray(com_filter(wd, h), jnp.float32)   # [2, H, W]
    fu = filt[0][None, :, :, None]
    fv = filt[1][None, :, :, None]
    u = jnp.sum(fu * heatmaps, axis=(1, 2))              # [B, J]
    v = jnp.sum(fv * heatmaps, axis=(1, 2))

    mask32 = mask.astype(jnp.float32)
    recon = (depthmaps.astype(jnp.float32) + label_img.astype(jnp.float32)) * mask32
    mh = heatmaps * mask32
    d = jnp.sum(mh * recon, axis=(1, 2)) / (jnp.sum(mh, axis=(1, 2)) + 1e-14)

    uvd = jnp.stack([u, v, d], axis=-1)
    return heatmaps, uvd
