"""cv2-semantics image ops as pure XLA programs.

The reference pipeline (reference: datasets.py:185-403) leans on OpenCV's C++
internals for three pixel ops: ``cv2.resize`` (INTER_LINEAR), ``cv2.warpAffine``
(INTER_LINEAR, BORDER_CONSTANT 0) and ``cv2.GaussianBlur`` (BORDER_REFLECT_101).
Here those become batched, jit-compiled gathers/convolutions that run on TPU
with fully static shapes, so the whole per-sample pipeline can live inside one
compiled train step instead of a CPU worker pool.

Key semantics replicated (verified by golden tests against cv2):

* ``cv2.resize`` INTER_LINEAR for float images: source coordinate
  ``s = (d + 0.5) * src/dst - 0.5`` with *coefficient clamping* at the edges
  (if the floor index falls below 0 the weight snaps to pixel 0; if it falls at
  or beyond ``src-1`` it snaps to pixel ``src-1``).
* ``cv2.warpAffine`` inverse-maps destination pixels through the inverted
  affine matrix and quantizes the fractional offsets to a 1/32 grid
  (``INTER_BITS == 5``) — even for float images. Out-of-range taps read the
  constant border value 0.
* ``cv2.GaussianBlur`` uses a separable kernel computed in float64 and
  BORDER_REFLECT_101 padding (``jnp.pad`` ``mode='reflect'``).

``crop_resize`` additionally folds the reference's pad-and-slice
``center_crop`` (reference: utils.py:167-173) and the subsequent
``cv2.resize`` (reference: datasets.py:271) into one sampling grid over the
*full* raw frame, so no dynamically-shaped intermediate crop ever exists:
every sample is a fixed-size separable gather regardless of its box size.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# cv2's INTER_BITS: warpAffine fractional offsets are quantized to 1/32.
_INTER_TAB_SIZE = 32


def _resize_taps(out_size: int, src_size, dtype=jnp.float32):
    """Tap indices and weights for one axis of a cv2 INTER_LINEAR resize.

    ``src_size`` may be a traced int32 scalar (dynamic crop sizes) or a python
    int. Returns ``(i0, i1, w1)`` where the sample is
    ``v[i0] * (1 - w1) + v[i1] * w1`` and indices are already clamped to
    ``[0, src_size - 1]`` with cv2's coefficient-clamping rule.
    """
    src = jnp.asarray(src_size, dtype)
    d = jnp.arange(out_size, dtype=dtype)
    s = (d + 0.5) * (src / out_size) - 0.5
    i0 = jnp.floor(s)
    w1 = s - i0
    i0 = i0.astype(jnp.int32)
    src_i = jnp.asarray(src_size, jnp.int32)
    # cv2: sx < 0 -> take pixel 0 fully; sx >= src-1 -> take pixel src-1 fully.
    w1 = jnp.where(i0 < 0, 0.0, w1)
    i0 = jnp.maximum(i0, 0)
    w1 = jnp.where(i0 >= src_i - 1, 1.0, w1)
    i0 = jnp.minimum(i0, jnp.maximum(src_i - 2, 0))
    i1 = jnp.minimum(i0 + 1, src_i - 1)
    return i0, i1, w1


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """cv2.resize(img, (out_w, out_h)) with INTER_LINEAR, for a 2-D image."""
    h, w = img.shape
    r0, r1, wr = _resize_taps(out_h, h, img.dtype)
    c0, c1, wc = _resize_taps(out_w, w, img.dtype)
    rows = img[r0, :] * (1.0 - wr)[:, None] + img[r1, :] * wr[:, None]
    out = rows[:, c0] * (1.0 - wc)[None, :] + rows[:, c1] * wc[None, :]
    return out


def crop_resize(
    frame: jax.Array,
    top,
    left,
    crop_size,
    out_size: int,
) -> jax.Array:
    """Zero-padded window crop + cv2 INTER_LINEAR resize as one gather.

    Equivalent to the reference's ``center_crop`` (zero padding outside the
    frame, reference: utils.py:167-173) followed by
    ``cv2.resize(crop, (out_size, out_size))`` (reference: datasets.py:271),
    but sampled directly from the full ``frame`` so the variable-size crop
    never materializes.

    Args:
      frame: ``[H, W]`` float image.
      top, left: int32 scalars — crop top-left corner in frame coordinates
        (may be negative or exceed the frame; those pixels read 0).
      crop_size: int32 scalar — side length ``S`` of the (square) crop.
      out_size: static python int — output side length.
    """
    h, w = frame.shape
    top = jnp.asarray(top, jnp.int32)
    left = jnp.asarray(left, jnp.int32)

    r0, r1, wr = _resize_taps(out_size, crop_size, frame.dtype)
    c0, c1, wc = _resize_taps(out_size, crop_size, frame.dtype)

    def _axis_gather_rows(i):
        fi = top + i                     # frame row per output tap
        ok = (fi >= 0) & (fi < h)
        fi = jnp.clip(fi, 0, h - 1)
        vals = frame[fi, :]              # [out_size, W]
        return vals * ok[:, None].astype(frame.dtype)

    rows = _axis_gather_rows(r0) * (1.0 - wr)[:, None] + _axis_gather_rows(r1) * wr[:, None]

    def _axis_gather_cols(j):
        fj = left + j
        ok = (fj >= 0) & (fj < w)
        fj = jnp.clip(fj, 0, w - 1)
        vals = rows[:, fj]               # [out_size, out_size]
        return vals * ok[None, :].astype(frame.dtype)

    out = _axis_gather_cols(c0) * (1.0 - wc)[None, :] + _axis_gather_cols(c1) * wc[None, :]
    return out


def rotation_matrix_inverse(angle_deg, scale, center_x, center_y):
    """Inverse of cv2.getRotationMatrix2D(center, angle, scale) as a 2x3.

    cv2.warpAffine inverts the forward matrix internally (dst -> src map);
    we build that inverse analytically. Forward matrix (reference usage:
    utils.py:74-75): ``[[a, b, (1-a)cx - b cy], [-b, a, b cx + (1-a) cy]]``
    with ``a = s cos(t), b = s sin(t)``. Its inverse is a rotation by ``-t``
    scaled by ``1/s`` about the same center.
    """
    t = angle_deg * (jnp.pi / 180.0)
    a = jnp.cos(t) / scale
    b = jnp.sin(t) / scale
    # dst -> src: src = Rinv @ (dst - c) + c
    m00, m01 = a, -b
    m10, m11 = b, a
    m02 = center_x - (m00 * center_x + m01 * center_y)
    m12 = center_y - (m10 * center_x + m11 * center_y)
    return jnp.stack([m00, m01, m02, m10, m11, m12])


def warp_affine_inverse(
    img: jax.Array,
    minv: jax.Array,
    quantize: bool = False,
    method: str = "dot",
) -> jax.Array:
    """cv2.warpAffine semantics with a dst->src matrix.

    ``minv`` is the *inverse* (dst -> src) 2x3 matrix flattened to ``[6]``
    (``[m00, m01, m02, m10, m11, m12]``). INTER_LINEAR, BORDER_CONSTANT 0.

    Modern cv2 (>=4.8 warp engine; verified against cv2 5.0 with ramp-image
    probes) uses *unquantized float* source coordinates for float images —
    ``quantize=False`` (default) matches it to ~1e-5 px. ``quantize=True``
    emulates the legacy fixed-point path (per-axis terms rounded at 1/1024
    = AB_BITS, +16 rounding delta, floor-shift to the 1/32 INTER_BITS grid)
    for parity with older OpenCV builds.
    """
    h, w = img.shape
    ys = jnp.arange(h, dtype=img.dtype)
    xs = jnp.arange(w, dtype=img.dtype)

    if quantize:
        ab = 1024.0  # 1 << AB_BITS
        shift = ab / _INTER_TAB_SIZE          # 32
        delta = shift / 2                     # cv2's ROUND_DELTA = 16
        # per-column and per-row rounded terms (cv2's adelta/bdelta tables)
        ax = jnp.round(minv[0] * xs * ab)     # [W]
        ay = jnp.round(minv[3] * xs * ab)
        bx = jnp.round((minv[1] * ys + minv[2]) * ab) + delta  # [H]
        by = jnp.round((minv[4] * ys + minv[5]) * ab) + delta
        xq = jnp.floor((bx[:, None] + ax[None, :]) / shift)    # units of 1/32
        yq = jnp.floor((by[:, None] + ay[None, :]) / shift)
        ix = jnp.floor(xq / _INTER_TAB_SIZE).astype(jnp.int32)
        iy = jnp.floor(yq / _INTER_TAB_SIZE).astype(jnp.int32)
        fx = (xq - ix.astype(img.dtype) * _INTER_TAB_SIZE) / _INTER_TAB_SIZE
        fy = (yq - iy.astype(img.dtype) * _INTER_TAB_SIZE) / _INTER_TAB_SIZE
    else:
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        sx = minv[0] * gx + minv[1] * gy + minv[2]
        sy = minv[3] * gx + minv[4] * gy + minv[5]
        ix = jnp.floor(sx).astype(jnp.int32)
        iy = jnp.floor(sy).astype(jnp.int32)
        fx = sx - ix.astype(img.dtype)
        fy = sy - iy.astype(img.dtype)

    if method == "dot":
        # MXU formulation: bilinear tap weights are hat functions
        # w(y) = max(0, 1 - |y - sy|), so the warp is exactly
        #   out[i,j] = sum_y sum_x hat(y - sy[i,j]) * hat(x - sx[i,j]) * img[y,x]
        # = one [S*S, H] x [H, W] matmul + a masked reduce over x. Zero-border
        # falls out naturally (hats vanish beyond distance 1). This avoids
        # general 2-D gathers, which are catastrophically slow on TPU (the
        # 4-tap gather version measured 95 ms/step in training profiles).
        sy_f = iy.astype(img.dtype) + fy
        sx_f = ix.astype(img.dtype) + fx
        yv = jnp.arange(h, dtype=img.dtype)
        xv = jnp.arange(w, dtype=img.dtype)
        haty = jnp.maximum(0.0, 1.0 - jnp.abs(yv[None, None, :] - sy_f[:, :, None]))
        tmp = jnp.einsum(
            "ijy,yx->ijx", haty, img, precision=jax.lax.Precision.HIGHEST
        )
        hatx = jnp.maximum(0.0, 1.0 - jnp.abs(xv[None, None, :] - sx_f[:, :, None]))
        return jnp.sum(tmp * hatx, axis=-1)

    def tap(yi, xi):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return img[yc, xc] * ok.astype(img.dtype)

    v00 = tap(iy, ix)
    v01 = tap(iy, ix + 1)
    v10 = tap(iy + 1, ix)
    v11 = tap(iy + 1, ix + 1)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel(ksize, sigma) computed in float64.

    Matches cv2 for sigma > 0 (reference blur: utils.py:64-65 uses
    ksize=7, sigma=1.5 by default — datasets constructor defaults).
    """
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    i = np.arange(ksize, dtype=np.float64)
    x = i - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k


def gaussian_blur(img: jax.Array, ksize: int, sigma: float) -> jax.Array:
    """cv2.GaussianBlur(img, (ksize, ksize), sigma) with BORDER_REFLECT_101.

    ``img`` may have leading batch dims; the blur applies over the last two.
    Implemented as two 1-D convolutions on reflect-101 padded input.
    """
    k = jnp.asarray(gaussian_kernel_1d(ksize, sigma), img.dtype)
    pad = ksize // 2
    lead = img.ndim - 2
    pad_cfg_r = [(0, 0)] * lead + [(pad, pad), (0, 0)]
    pad_cfg_c = [(0, 0)] * lead + [(0, 0), (pad, pad)]

    x = jnp.pad(img, pad_cfg_r, mode="reflect")
    # rows: out[..., i, j] = sum_t k[t] * x[..., i + t, j]
    x = sum(k[t] * jax.lax.slice_in_dim(x, t, t + img.shape[-2], axis=-2) for t in range(ksize))
    x = jnp.pad(x, pad_cfg_c, mode="reflect")
    x = sum(k[t] * jax.lax.slice_in_dim(x, t, t + img.shape[-1], axis=-1) for t in range(ksize))
    return x
