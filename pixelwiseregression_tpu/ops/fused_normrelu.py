"""Fused instance-norm + relu with a minimal-traffic backward.

Motivation (PERF.md "Round 5 — train-step verdict, part 2"): the last
attributed gap in the train step is the norm/relu backward chain — measured
8.16 us/frame standalone at [128,64,64,128] bf16, ~2.1x its ~3.8 us/frame
HBM bandwidth floor, and the dominant non-conv cost of every head-conv
unit's backward (reference chain: conv -> InstanceNorm2d -> relu,
/root/reference/model.py:54-65,164-187). XLA's composed chain pays extra
passes because (a) the relu mask is taken from the saved relu OUTPUT (one
more full read) and (b) the stat-gradient reductions and the dx pass each
re-read (g, x) — the reductions must complete before dx, and XLA does not
keep megabyte blocks resident across that dependency.

Two backward engines behind the same forward / residuals
(x in its original dtype, per-(B,C) f32 mean & rsqrt, affine params):

* ``norm_relu``        — ONE custom_vjp over ``relu(norm(x))`` in pure XLA:
  the relu mask is recomputed from the saved norm input inside the same
  elementwise chain as the stat reductions, so the relu-output residual is
  never read in the backward (one fewer HBM pass than the composed
  autodiff chain). Numerics identical to
  ``jax.nn.relu(_instance_norm(x, s, b, eps).astype(x.dtype))``:
  the mask is computed on the value AFTER the activation-dtype round-trip,
  and ``jax.nn.relu``'s custom JVP (zero at exactly 0) is replicated by a
  strict ``> 0`` test.
* ``norm_relu_pallas`` — the same math as ONE pallas kernel, grid over
  batch, each step holding its (g, x) sample blocks resident in VMEM:
  mask + both reductions + the dx pass share a single HBM read of (g, x)
  and one write of dx — 3 passes, the physical floor. dscale/dbias
  accumulate across the sequential TPU grid in a revisited [1, C] block.

Both return the relu output in ``x.dtype`` (the model applies norms under
mixed precision as bf16-in / bf16-out with f32 stats —
models/layers.py:InstanceNorm).

MEASURED VERDICT (2026-08-20, v5e, head-unit shape [128,64,64,128] bf16;
PERF.md "Round 5 — train-step verdict, part 3";
tpu_queue_logs/normrelu_ab_20260820.log): BOTH engines LOSE to XLA's
composed chain and are NOT wired into the model. Composed-chain baseline
8.25 us/frame; fused VJP 8.54 (−3.5%, tie composed in the unit); pallas
9.98 at bt=8 (−21% standalone, −19.7% composed — ~2.6x the bandwidth
floor despite provably minimal HBM traffic: the in-kernel VPU glue
serialized against the block DMAs costs more than the pass XLA re-reads,
and the kernel boundary breaks the conv-gradient fusion worth 27% on
this unit). Kept as the measured-negative reference that converts part
2's "history says a pallas norm-backward breaks more fusion than it
saves" from prediction to data, and as a correct starting point for
backends whose reduce scheduling improves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 124 * 1024 * 1024


def _is_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _norm_relu_fwd(x, scale, bias, eps):
    # identical stats path to models/layers.py:_instance_norm_fwd (two-pass
    # torch-semantics variance), then the module's astype + relu folded in.
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    a = inv * scale
    b = bias - mean * a
    y = (x32 * a + b).astype(x.dtype)
    return jax.nn.relu(y), (x, mean, inv, scale, bias)


def _bwd_math(g, x, mean, inv, scale, bias):
    """Shared backward expressions on f32 blocks; callers choose layout.

    ``g`` is the cotangent of the relu output (activation dtype). The mask
    is recomputed bit-exactly as the forward's post-cast compare: y is
    rebuilt with the same a/b folding the forward used, rounded to the
    activation dtype, and tested ``> 0`` (jax.nn.relu's subgradient at 0
    is 0)."""
    x32 = x.astype(jnp.float32)
    a = inv * scale
    b = bias - mean * a
    y = (x32 * a + b).astype(x.dtype)
    g32 = jnp.where(y > 0, g.astype(jnp.float32), 0.0)
    xhat = (x32 - mean) * inv
    gx = g32 * xhat
    mg = jnp.mean(g32, axis=(1, 2), keepdims=True)
    mgx = jnp.mean(gx, axis=(1, 2), keepdims=True)
    dx = (a * (g32 - mg - xhat * mgx)).astype(x.dtype)
    dscale = jnp.sum(gx, axis=(0, 1, 2))
    dbias = jnp.sum(g32, axis=(0, 1, 2))
    return dx, dscale, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def norm_relu(x, scale, bias, eps):
    """``relu(instance_norm(x))`` with a one-pass-fewer fused backward."""
    y, _ = _norm_relu_fwd(x, scale, bias, eps)
    return y


def _norm_relu_bwd(eps, res, g):
    del eps  # inv already carries it
    x, mean, inv, scale, bias = res
    return _bwd_math(g, x, mean, inv, scale, bias)


norm_relu.defvjp(_norm_relu_fwd, _norm_relu_bwd)


# ---------------------------------------------------------------------------
# pallas backward
# ---------------------------------------------------------------------------


def _bwd_kernel(g_ref, x_ref, stats_ref, scale_ref, bias_ref,
                dx_ref, ds_ref, db_ref, *, bt, act_dtype):
    # stats_ref: [bt, 2, C] — (mean, inv) stacked so the block's trailing
    # dims equal the array's (mosaic requires last-two block dims divisible
    # by (8, 128) or exactly equal; a [bt, C] stat block violates that).
    C = scale_ref.shape[-1]
    scale = scale_ref[...]  # [1, C] f32
    bias = bias_ref[...]
    ds_acc = jnp.zeros((1, C), jnp.float32)
    db_acc = jnp.zeros((1, C), jnp.float32)
    for s in range(bt):
        x32 = x_ref[s].astype(jnp.float32)          # [HW, C]
        g32 = g_ref[s].astype(jnp.float32)
        st = stats_ref[s]                           # [2, C]
        mean = st[0:1]
        inv = st[1:2]
        a = inv * scale
        b = bias - mean * a
        # mosaic can't lower a bf16 cmpf on this target: round-trip through
        # the activation dtype for the forward's rounding, compare in f32
        # (the up-cast is exact, so the mask is identical)
        y = (x32 * a + b).astype(act_dtype).astype(jnp.float32)
        g32 = jnp.where(y > 0.0, g32, 0.0)
        xhat = (x32 - mean) * inv
        gx = g32 * xhat
        mg = jnp.mean(g32, axis=0, keepdims=True)
        mgx = jnp.mean(gx, axis=0, keepdims=True)
        dx_ref[s] = (a * (g32 - mg - xhat * mgx)).astype(act_dtype)
        ds_acc = ds_acc + jnp.sum(gx, axis=0, keepdims=True)
        db_acc = db_acc + jnp.sum(g32, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ds_ref[...] = ds_acc
        db_ref[...] = db_acc

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        ds_ref[...] += ds_acc
        db_ref[...] += db_acc


def _pallas_bwd(g, x, mean, inv, scale, bias, *, bt, interpret):
    B, H, W, C = x.shape
    HW = H * W
    if B % bt != 0:
        bt = 1
    blk = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)
    dx, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel, bt=bt, act_dtype=x.dtype),
        grid=(B // bt,),
        in_specs=[
            blk((bt, HW, C), lambda i: (i, 0, 0)),
            blk((bt, HW, C), lambda i: (i, 0, 0)),
            blk((bt, 2, C), lambda i: (i, 0, 0)),
            blk((1, C), lambda i: (0, 0)),
            blk((1, C), lambda i: (0, 0)),
        ],
        out_specs=[
            blk((bt, HW, C), lambda i: (i, 0, 0)),
            blk((1, C), lambda i: (0, 0)),
            blk((1, C), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, HW, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=12 * B * HW * C,
            bytes_accessed=B * HW * C * (2 * g.dtype.itemsize
                                         + x.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        g.reshape(B, HW, C), x.reshape(B, HW, C),
        jnp.stack([mean.reshape(B, C), inv.reshape(B, C)], axis=1),
        scale.reshape(1, C).astype(jnp.float32),
        bias.reshape(1, C).astype(jnp.float32),
    )
    return dx.reshape(B, H, W, C), ds.reshape(C), db.reshape(C)


def make_norm_relu_pallas(bt: int = 1, interpret: bool | None = None):
    """Build a ``norm_relu`` whose backward is the VMEM-resident pallas
    kernel with ``bt`` samples per grid step (block = bt x [HW, C])."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def f(x, scale, bias, eps):
        y, _ = _norm_relu_fwd(x, scale, bias, eps)
        return y

    def bwd(eps, res, g):
        del eps
        x, mean, inv, scale, bias = res
        interp = (not _is_tpu()) if interpret is None else interpret
        return _pallas_bwd(g, x, mean, inv, scale, bias,
                           bt=bt, interpret=interp)

    f.defvjp(_norm_relu_fwd, bwd)
    return f


norm_relu_pallas = make_norm_relu_pallas()
