"""Fused conv + instance-norm + relu Pallas kernels (TPU).

The two-pass (torch-semantics) instance-norm variance costs one extra HBM
read of every activation on the XLA path: the var reduction depends on the
mean, so it cannot fuse into the producing conv the way the one-pass
E[x^2]-E[x]^2 stats could (see models/layers.py:_instance_norm_fwd — the
one-pass form fails trained-checkpoint parity by ~20 mm). These kernels
remove that read by keeping a whole per-sample activation resident in VMEM
and computing BOTH stat passes there, fused with the convolution that
already touches the data:

* epilogue form  — ``z = relu(norm(conv(x)))``  (stem / head order,
  reference model.py:54-65, 164-187)
* prologue form  — ``y = conv(relu(norm(x)))``  (pre-activation ResBlock
  order, reference model.py:6-23), with an optional fused residual add
  (``y + skip``, the ResBlock output — model.py:22).

HBM traffic per fused unit is the physical minimum: one read of x, one
write of the result — identical to what XLA achieves with the UNSAFE
one-pass stats, but with exact two-pass variance.

Conv-as-matmul layout (what made this viable where the round-2
whole-hourglass kernel was not): activations live as ``[HW, C]`` (pixels on
sublanes, channels on lanes). The 3x3 conv becomes THREE matmuls on
tile-aligned operands:

    xm[p]       = concat(x[p-1]*maskL, x[p], x[p+1]*maskR)   # [HW, 3C]
    xm_pad      = [W zero rows; xm; W zero rows]             # [(H+2)W, 3C]
    y[p]        = sum_di  xm_pad[di*W + p] @ Wcat[di]        # di in 0,1,2

The dj=+-1 horizontal taps are 1-row circular rolls (pltpu.roll on
sublanes) with left/right-edge masks; the di vertical taps are STATIC
slices of xm_pad at offsets that are multiples of W (>= 8 rows, so every
slice is sublane-tile aligned and lowers without relayout — the
"input-shift slices relayout" failure mode of ops/pallas_hourglass.py does
not apply). Zero pad rows give the conv's zero padding for free.

Numerics match the XLA path: activation-dtype operands into the MXU with
f32 accumulation, conv output rounded to the activation dtype BEFORE the
f32 stats (exactly what the stored-bf16-activation XLA path computes stats
on), biased variance, eps inside rsqrt.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-kernel VMEM ceiling: v5e has 128MB; leave headroom for the pipeline's
# double buffers (same budget the whole-hourglass kernel validated on-chip)
_VMEM_LIMIT = 124 * 1024 * 1024


def _is_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def pack_wcat(kernel_hwio: jax.Array) -> jax.Array:
    """Pack an HWIO ``[3, 3, C, Co]`` conv kernel into the ``[3, 3C, Co]``
    tap-matmul layout: ``wcat[di, dj*C:(dj+1)*C, :] = W[di, dj, :, :]`` so
    that column block dj of the xm concat (holding ``x[p + dj - 1]``)
    contracts with tap ``(di, dj)``."""
    k = kernel_hwio
    assert k.shape[0] == 3 and k.shape[1] == 3, k.shape
    return k.reshape(3, 3 * k.shape[2], k.shape[3])


def _norm_affine(y32, scale, bias, eps):
    """Two-pass instance norm + affine + relu on a VMEM-resident [N, C]
    f32 block (torch semantics: biased variance, eps inside rsqrt)."""
    mean = jnp.mean(y32, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=0, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    a = inv * scale
    b = bias - mean * a
    return jnp.maximum(y32 * a + b, 0.0)


def _build_xm(xn, H, W, C, dtype):
    """[HW, C] -> [(H+2)W, 3C] padded dj-concat. Rolls are 1-sublane
    circular shifts; edge masks zero the rows that wrapped across
    image-row boundaries."""
    HW = H * W
    rowpos = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0) % W
    left = pltpu.roll(xn, 1, axis=0)  # row p holds x[p-1]
    left = jnp.where(rowpos == 0, jnp.zeros_like(left), left)
    right = pltpu.roll(xn, HW - 1, axis=0)  # circular -1: row p holds x[p+1]
    right = jnp.where(rowpos == W - 1, jnp.zeros_like(right), right)
    xm = jnp.concatenate([left, xn, right], axis=1).astype(dtype)
    zpad = jnp.zeros((W, 3 * C), dtype)
    return jnp.concatenate([zpad, xm, zpad], axis=0)


def _fused_unit_kernel(
    *refs, H, W, C, Co, ksize, pro, epi, has_skip, eps, act_dtype,
):
    """One fused [prologue-norm] -> conv -> [epilogue-norm | +skip] unit
    for a single sample. Ref order:
      x [1, HW, C], w, b [1, Co], ps, pb, es, eb, (skip [1, HW, Co]), out
    """
    if has_skip:
        x_ref, w_ref, b_ref, ps_ref, pb_ref, es_ref, eb_ref, s_ref, o_ref = refs
    else:
        x_ref, w_ref, b_ref, ps_ref, pb_ref, es_ref, eb_ref, o_ref = refs
        s_ref = None
    HW = H * W
    if pro:
        x32 = x_ref[0].astype(jnp.float32)
        xn = _norm_affine(x32, ps_ref[:], pb_ref[:], eps)
        xn = xn.astype(act_dtype)  # round like the XLA path's stored act
    else:
        xn = x_ref[0]

    if ksize == 3:
        xm_pad = _build_xm(xn, H, W, C, act_dtype)
        acc = jnp.zeros((HW, Co), jnp.float32)
        for di in range(3):
            sl = xm_pad[di * W : di * W + HW, :]
            acc += jax.lax.dot_general(
                sl, w_ref[di],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:
        acc = jax.lax.dot_general(
            xn, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y = acc + b_ref[:]

    if epi:
        # stats on the activation-dtype-rounded conv output — identical to
        # the XLA path, which stores y in act dtype and upcasts for stats
        y32 = y.astype(act_dtype).astype(jnp.float32)
        o_ref[0] = _norm_affine(y32, es_ref[:], eb_ref[:], eps).astype(act_dtype)
    elif has_skip:
        # residual add in act dtype: XLA computes x + h on act-dtype values
        o_ref[0] = y.astype(act_dtype) + s_ref[0]
    else:
        o_ref[0] = y.astype(act_dtype)


def fused_conv_norm(
    x: jax.Array,
    kernel_hwio: jax.Array,
    conv_bias: jax.Array,
    *,
    pro_scale: jax.Array | None = None,
    pro_bias: jax.Array | None = None,
    epi_scale: jax.Array | None = None,
    epi_bias: jax.Array | None = None,
    skip: jax.Array | None = None,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused [instance-norm+relu] -> conv -> [instance-norm+relu | +skip]
    on NHWC.

    ``x`` [B, H, W, C]; ``kernel_hwio`` [k, k, C, Co] (k in {1, 3});
    ``conv_bias`` [Co]. Prologue/epilogue norms are enabled by passing
    their scale/bias (f32 [C] / [Co]); ``skip`` [B, H, W, Co] adds a
    residual to the conv output (mutually exclusive with the epilogue).
    Returns [B, H, W, Co] in x.dtype. Forward only — training wraps this
    in a custom_vjp (see models/fused_forward.py).
    """
    B, H, W, C = x.shape
    k = kernel_hwio.shape[0]
    Co = kernel_hwio.shape[-1]
    HW = H * W
    act_dtype = x.dtype
    pro = pro_scale is not None
    epi = epi_scale is not None
    assert not (epi and skip is not None), "epilogue and skip are exclusive"
    if interpret is None:
        interpret = not _is_tpu()

    if k == 3:
        w = pack_wcat(kernel_hwio).astype(act_dtype)
    elif k == 1:
        w = kernel_hwio.reshape(C, Co).astype(act_dtype)
    else:
        raise ValueError(f"kernel_size {k} unsupported (1 or 3)")

    def vec(v):
        return (v if v is not None else jnp.zeros((1,), jnp.float32)).reshape(1, -1).astype(jnp.float32)

    ps, pb, es, eb = vec(pro_scale), vec(pro_bias), vec(epi_scale), vec(epi_bias)
    bias2 = conv_bias.reshape(1, Co).astype(jnp.float32)

    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)

    kern = functools.partial(
        _fused_unit_kernel, H=H, W=W, C=C, Co=Co, ksize=k,
        pro=pro, epi=epi, has_skip=skip is not None, eps=eps,
        act_dtype=act_dtype,
    )
    operands = [x.reshape(B, HW, C), w, bias2, ps, pb, es, eb]
    in_specs = [
        pl.BlockSpec((1, HW, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        full(w), full(bias2), full(ps), full(pb), full(es), full(eb),
    ]
    if skip is not None:
        operands.append(skip.reshape(B, HW, Co))
        in_specs.append(pl.BlockSpec((1, HW, Co), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, HW, Co), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, Co), act_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * HW * C * Co * k * k,
            bytes_accessed=B * HW * (C + Co) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, H, W, Co)
