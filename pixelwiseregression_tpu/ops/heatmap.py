"""Label synthesis ops: COM filter, heatmap splat, blurred heatmaps, Dmaps.

Replaces the reference's per-sample numpy/cv2 label generation
(reference: utils.py:24-65, datasets.py:287-299, 369-375) with batched,
vmappable XLA ops so labels are synthesized on-device inside the jitted
train step.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.ops.image import gaussian_blur


def com_filter(size_u: int, size_v: int) -> np.ndarray:
    """Normalized centered-coordinate filter for soft-argmax.

    Returns ``[2, size_v, size_u]`` where channel 0 holds
    ``(j - size_u//2) / (size_u - 1)`` and channel 1 holds
    ``(i - size_v//2) / (size_v - 1)`` (reference: utils.py:24-35).
    Computed once in numpy; consumed as a constant by the decoder.
    """
    cu = size_u // 2
    cv = size_v // 2
    j = np.arange(size_u, dtype=np.float64)
    i = np.arange(size_v, dtype=np.float64)
    fu = np.broadcast_to((j - cu) / (size_u - 1), (size_v, size_u))
    fv = np.broadcast_to(((i - cv) / (size_v - 1))[:, None], (size_v, size_u))
    return np.stack([fu, fv], axis=0)


def splat_heatmap(size: int, u, v):
    """2x2 sub-pixel splat of a unit of mass at continuous (u, v).

    Replicates the reference's non-standard bilinear splat
    (reference: utils.py:37-62): with ``du, dv`` the fractional parts, the
    four corner weights are

        d = (max(du + dv - 1, 0) + min(du, dv)) / 2
        b = du - d;  c = dv - d;  a = 1 + d - du - dv

    written to ``[(lv,lu)=a, (lv,lu+1)=b, (lv+1,lu)=c, (lv+1,lu+1)=d]``.
    numpy's negative-index *wrap-around* is replicated deliberately (indices
    in ``[-size, -1]`` write to ``size+idx`` without error in the reference);
    only an index ``>= size`` raises there, which maps to ``valid=False``
    here.

    Returns ``(heatmap [size, size], valid bool scalar)``. The heatmap is
    zeroed when invalid.
    """
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    lu = jnp.floor(u).astype(jnp.int32)
    lv = jnp.floor(v).astype(jnp.int32)
    du = u - lu.astype(jnp.float32)
    dv = v - lv.astype(jnp.float32)

    min_d = jnp.maximum(du + dv - 1.0, 0.0)
    max_d = jnp.minimum(du, dv)
    d = (max_d + min_d) / 2.0
    b = du - d
    c = dv - d
    a = 1.0 + d - du - dv

    valid = (lu + 1 <= size - 1) & (lv + 1 <= size - 1) & (lu >= -size) & (lv >= -size)

    def wrap_onehot(idx):
        return jax.nn.one_hot(jnp.mod(idx, size), size, dtype=jnp.float32)

    ou0 = wrap_onehot(lu)
    ou1 = wrap_onehot(lu + 1)
    ov0 = wrap_onehot(lv)
    ov1 = wrap_onehot(lv + 1)

    hm = ov0[:, None] * (a * ou0 + b * ou1)[None, :] + ov1[:, None] * (c * ou0 + d * ou1)[None, :]
    return hm * valid.astype(jnp.float32), valid


def synthesize_labels(
    uvd_kernel: jax.Array,
    depth_centered: jax.Array,
    label_image: jax.Array,
    label_size: int,
    kernel_size: int,
    sigma: float,
):
    """Per-joint blurred heatmaps + depth residual maps for one sample.

    Args:
      uvd_kernel: ``[J, 2]`` joint (u, v) in label-image pixel coordinates
        (reference: datasets.py:288-290).
      depth_centered: ``[J]`` COM-centered joint depths (``uvd[:, 2]``).
      label_image: ``[label_size, label_size]`` COM-centered depth label image.
      label_size, kernel_size, sigma: static label-synthesis params.

    Returns ``(heatmaps [J, S, S], dmaps [J, S, S], mask [S, S], valid [J])``
    following reference: datasets.py:293-299, 369-375:
    ``mask = label_image != 0``; ``dmap_j = (d_j - label) * (hm_j > 0) * mask``.
    """
    splat = jax.vmap(lambda uv: splat_heatmap(label_size, uv[0], uv[1]))
    hms, valid = splat(uvd_kernel)                        # [J, S, S], [J]
    hms = gaussian_blur(hms, kernel_size, sigma)

    mask = (label_image != 0).astype(jnp.float32)
    heatmask = (hms > 0).astype(jnp.float32) * mask[None]
    dmaps = (depth_centered[:, None, None] - label_image[None]) * heatmask
    return hms, dmaps, mask, valid
