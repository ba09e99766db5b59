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
    image-row boundaries. Mosaic only lowers rotates on 32-bit lanes, so
    the rolls run on an f32 copy and the result is cast to the act dtype."""
    HW = H * W
    x32 = xn.astype(jnp.float32)
    rowpos = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0) % W
    left = pltpu.roll(x32, 1, axis=0)  # row p holds x[p-1]
    left = jnp.where(rowpos == 0, jnp.zeros_like(left), left)
    right = pltpu.roll(x32, HW - 1, axis=0)  # circular -1: row p holds x[p+1]
    right = jnp.where(rowpos == W - 1, jnp.zeros_like(right), right)
    xm = jnp.concatenate(
        [left.astype(dtype), xn.astype(dtype), right.astype(dtype)], axis=1
    )
    zpad = jnp.zeros((W, 3 * C), dtype)
    return jnp.concatenate([zpad, xm, zpad], axis=0)


def _fused_chain_kernel(*refs, H, W, bt, specs, has_skip, eps, act_dtype):
    """Chain of fused units on ``bt`` samples, everything VMEM-resident.
    Ref order: x, (w, b, ps, pb, es, eb) per unit, [skip], out.

    With bt > 1 each unit's work is STAGE-SLICED across the block's
    samples (all prologue+xm builds, then all dot chains, then all
    epilogues): the stages of different samples are data-independent, so
    Mosaic's scheduler overlaps sample B's VPU glue with sample A's MXU
    dots — measured 13% on the head unit (tools/ablate_fused2.py)."""
    n = len(specs)
    n_in = 1 + 6 * n + (1 if has_skip else 0)
    x_ref = refs[0]
    unit_refs = refs[1 : 1 + 6 * n]
    s_ref = refs[6 * n + 1] if has_skip else None
    o_ref = refs[n_in]

    HW = H * W
    hs = [x_ref[s] for s in range(bt)]
    for u, (ksize, pro, epi, _) in enumerate(specs):
        w, b, ps, pb, es, eb = (r[:] for r in unit_refs[6 * u : 6 * u + 6])
        Co = w.shape[-1]
        # stage 1: prologue norm + xm build (VPU)
        ops = []
        for s in range(bt):
            xn = hs[s]
            if pro:
                xn = _norm_affine(
                    xn.astype(jnp.float32), ps, pb, eps
                ).astype(act_dtype)
            ops.append(_build_xm(xn, H, W, xn.shape[-1], act_dtype)
                       if ksize == 3 else xn)
        # stage 2: dot chains (MXU)
        accs = []
        for s in range(bt):
            if ksize == 3:
                acc = jnp.zeros((HW, Co), jnp.float32)
                for di in range(3):
                    acc += jax.lax.dot_general(
                        ops[s][di * W : di * W + HW], w[di],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            else:
                acc = jax.lax.dot_general(
                    ops[s], w,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            accs.append(acc)
        # stage 3: bias + epilogue norm (VPU)
        for s in range(bt):
            y = accs[s] + b
            if epi:
                y32 = y.astype(act_dtype).astype(jnp.float32)
                hs[s] = _norm_affine(y32, es, eb, eps).astype(act_dtype)
            else:
                hs[s] = y.astype(act_dtype)
    for s in range(bt):
        if has_skip:
            hs[s] = hs[s] + s_ref[s]
        o_ref[s] = hs[s]


def fused_chain(
    x: jax.Array,
    units: list[dict],
    *,
    skip: jax.Array | None = None,
    bt: int = 1,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jax.Array:
    """Run a CHAIN of [pro-norm]->conv->[epi-norm] units in ONE Pallas
    kernel per sample: intermediates never leave VMEM, so a 3-conv head or
    a full ResBlock costs one HBM read of x and one write of the result.

    ``units``: each a dict with keys ``kernel`` (HWIO [k,k,C,Co], k in
    {1,3}), ``bias`` [Co], and optional ``pro``/``epi`` = (scale, bias)
    tuples enabling the prologue/epilogue instance norm. ``skip`` [B,H,W,Co]
    is added to the final conv output (the ResBlock residual,
    reference model.py:22). Forward only.
    """
    B, H, W, C = x.shape
    HW = H * W
    act_dtype = x.dtype
    if interpret is None:
        interpret = not _is_tpu()
    if B % bt != 0:
        bt = 1

    specs = []
    operands = [x.reshape(B, HW, C)]
    in_specs = [
        pl.BlockSpec((bt, HW, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    ]

    def vec(v):
        return (v if v is not None else jnp.zeros((1,), jnp.float32)).reshape(1, -1).astype(jnp.float32)

    full = lambda a: pl.BlockSpec(a.shape, lambda b, _n=None: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)

    cin = C
    for u in units:
        kern = u["kernel"]
        k = kern.shape[0]
        co = kern.shape[-1]
        assert kern.shape[2] == cin, (kern.shape, cin)
        if k == 3:
            w = pack_wcat(kern).astype(act_dtype)
        elif k == 1:
            w = kern.reshape(cin, co).astype(act_dtype)
        else:
            raise ValueError(f"kernel_size {k} unsupported (1 or 3)")
        pro = u.get("pro")
        epi = u.get("epi")
        b2 = u["bias"].reshape(1, co).astype(jnp.float32)
        ps, pb = (vec(pro[0]), vec(pro[1])) if pro else (vec(None), vec(None))
        es, eb = (vec(epi[0]), vec(epi[1])) if epi else (vec(None), vec(None))
        for a in (w, b2, ps, pb, es, eb):
            operands.append(a)
            in_specs.append(full(a))
        # NOTE (measured, round 3): a direct-store xm build into a
        # persistent VMEM scratch (lane-aligned column blocks) was SLOWER
        # than this concat build (10.8 vs 9.9 us/fr on the merged head) —
        # ref-routed dot operands cost more than the concat copies save.
        specs.append((k, pro is not None, epi is not None, False))
        cin = co

    if skip is not None:
        assert skip.shape[-1] == cin
        operands.append(skip.reshape(B, HW, cin))
        in_specs.append(pl.BlockSpec((bt, HW, cin), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))

    kern_fn = functools.partial(
        _fused_chain_kernel, H=H, W=W, bt=bt, specs=tuple(specs),
        has_skip=skip is not None, eps=eps, act_dtype=act_dtype,
    )
    flops = 0
    ci = C
    for u in units:
        k = u["kernel"].shape[0]
        co = u["kernel"].shape[-1]
        flops += 2 * B * HW * ci * co * k * k
        ci = co
    out = pl.pallas_call(
        kern_fn,
        grid=(B // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, HW, cin), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, cin), act_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * HW * (C + cin) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, H, W, cin)


def fused_conv_norm(
    x,
    kernel_hwio,
    conv_bias,
    *,
    pro_scale=None,
    pro_bias=None,
    epi_scale=None,
    epi_bias=None,
    skip=None,
    eps: float = 1e-5,
    interpret: bool | None = None,
):
    """Single fused [instance-norm+relu] -> conv -> [instance-norm+relu |
    +skip] unit on NHWC — a one-unit `fused_chain`; see that for semantics.
    """
    unit = {"kernel": kernel_hwio, "bias": conv_bias}
    if pro_scale is not None:
        unit["pro"] = (pro_scale, pro_bias)
    if epi_scale is not None:
        unit["epi"] = (epi_scale, epi_bias)
    return fused_chain(x, [unit], skip=skip, eps=eps, interpret=interpret)
