"""Training/eval steps: loss, optimizer, schedule, jitted step factories.

Loss definition matches the reference (reference: train.py:177-205):

  per stage i:  L_h = lambda_h * mean_{B,J} sum_{HW} (hm - hm*)^2
                L_d = lambda_d * mean_{B,J} sum_{HW} (dm - dm*)^2
                L_u = mean_{B,J} sum_3 (uvd - uvd*)^2
  total = sum_i  alpha * L_u + (1 - alpha) * (L_h + L_d)

(default alpha=1.0 zeroes the auxiliary losses — a reference quirk kept for
parity; train.py:57,185). Optimizer AdamW/SGD + StepLR x gamma every
`decay_epoch` epochs (train.py:139-143). Unlike the reference, the optional
on-device preprocessing is fused into the same jit as fwd/bwd, and invalid
samples (failed augmentation) are masked out of the loss instead of crashing
the input pipeline.

bf16 note: TPU mixed precision is plain bf16 activations (model dtype), no
loss scaling needed — gradients accumulate in f32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from pixelwiseregression_tpu.core.camera import Camera, recover_uvd
from pixelwiseregression_tpu.data.preprocess import PreprocessConfig, preprocess_batch


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def make_optimizer(
    opt: str = "adam",
    lr: float = 1e-3,
    beta1: float = 0.9,
    beta2: float = 0.999,
    weight_decay: float = 0.0,
    lr_decay: float = 0.2,
    decay_epoch: int = 15,
    steps_per_epoch: int = 1,
) -> optax.GradientTransformation:
    """AdamW / SGD with the reference's StepLR schedule.

    StepLR: lr * gamma^(epoch // decay_epoch), epoch = step // steps_per_epoch
    (reference: train.py:139-143).
    """

    def schedule(step):
        epoch = step // steps_per_epoch
        return lr * jnp.power(lr_decay, (epoch // decay_epoch).astype(jnp.float32))

    if opt == "adam":
        return optax.adamw(schedule, b1=beta1, b2=beta2, weight_decay=weight_decay)
    if opt == "sgd":
        tx = optax.sgd(schedule, momentum=beta1)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
        return tx
    raise ValueError(f"unknown optimizer {opt}")


def create_train_state(model, rng, sample_inputs, tx) -> TrainState:
    variables = model.init(rng, *sample_inputs, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def stage_losses(results, targets, lambda_h: float, lambda_d: float, sample_weight=None):
    """Per-stage (heatmap, depthmap, uvd) losses, reference reductions.

    ``sample_weight`` ([B], 0/1) masks out invalid samples; the mean then
    divides by the number of valid samples to keep the scale of the
    reference's plain mean.
    """
    hm_t = targets["heatmaps"].astype(jnp.float32)
    dm_t = targets["dmaps"].astype(jnp.float32)
    uvd_t = targets["uvd"].astype(jnp.float32)

    if sample_weight is None:
        sw = jnp.ones(hm_t.shape[0], jnp.float32)
    else:
        sw = sample_weight.astype(jnp.float32)
    denom_bj = jnp.maximum(jnp.sum(sw), 1.0) * hm_t.shape[-1]

    out = []
    for heatmaps, depthmaps, uvd in results:
        hm = heatmaps.astype(jnp.float32)
        dm = depthmaps.astype(jnp.float32)
        # maps are NHWC [B,H,W,J]: sum over HW, weighted mean over B,J
        l_h = lambda_h * jnp.sum(jnp.sum((hm - hm_t) ** 2, axis=(1, 2)) * sw[:, None]) / denom_bj
        l_d = lambda_d * jnp.sum(jnp.sum((dm - dm_t) ** 2, axis=(1, 2)) * sw[:, None]) / denom_bj
        l_u = jnp.sum(jnp.sum((uvd.astype(jnp.float32) - uvd_t) ** 2, axis=2) * sw[:, None]) / denom_bj
        out.append((l_h, l_d, l_u))
    return out


def total_loss(every_loss, alpha: float):
    loss = 0.0
    for l_h, l_d, l_u in every_loss:
        loss = loss + alpha * l_u + (1.0 - alpha) * (l_h + l_d)
    return loss


@dataclasses.dataclass(frozen=True)
class LossConfig:
    lambda_h: float = 1.0
    lambda_d: float = 0.01
    alpha: float = 1.0


def make_train_step(
    preprocess_cfg: Optional[PreprocessConfig],
    loss_cfg: LossConfig,
    augment: bool = True,
    donate: bool = True,
    jit: bool = True,
    compiler_options: Optional[Dict[str, str]] = None,
):
    """Build the jitted train step.

    If ``preprocess_cfg`` is given, the step consumes a *raw* host batch
    (frames + crop params) and runs on-device preprocessing fused with
    fwd/bwd. Otherwise it consumes preprocessed tensors directly
    (keys: img, label_img, mask, uvd, heatmaps, dmaps).

    ``jit=False`` returns the raw python step for embedding in an outer
    jit/scan (bench.py's in-jit timing loop). ``compiler_options`` are
    per-jit env_option_overrides for the backend compiler — the only route
    for ``xla_tpu_*`` knobs under the TPU tunnel (``--compiler_opts``).
    """

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        weight = batch.get("weight")
        if preprocess_cfg is not None:
            data = preprocess_batch(batch, rng, preprocess_cfg, augment=augment)
        else:
            data = batch
        sw = data.get("valid")
        if sw is not None:
            sw = sw.astype(jnp.float32)
        if weight is not None:
            w = weight.astype(jnp.float32)
            sw = w if sw is None else sw * w

        def loss_fn(params):
            variables = {"params": params}
            mutable = False
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = state.apply_fn(
                variables,
                data["img"],
                data["label_img"],
                data["mask"],
                train=True,
                mutable=mutable,
            )
            results, new_vars = out if mutable else (out, {})
            every = stage_losses(results, data, loss_cfg.lambda_h, loss_cfg.lambda_d, sw)
            loss = total_loss(every, loss_cfg.alpha)
            return loss, (every, new_vars.get("batch_stats", state.batch_stats))

        (loss, (every, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs, opt_state=new_opt
        )
        metrics = {
            "loss": loss,
            "stage_losses": jnp.asarray(every),  # [stages, 3] (h, d, u)
        }
        return new_state, metrics

    if not jit:
        return step
    # donate both the state AND the raw batch: the frame buffers are the
    # largest per-step HBM allocations and are re-uploaded fresh every step,
    # so giving them back to the allocator lets preprocessing reuse them
    return jax.jit(step, donate_argnums=(0, 1) if donate else (),
                   compiler_options=compiler_options)


def make_eval_step(
    preprocess_cfg: Optional[PreprocessConfig],
    loss_cfg: LossConfig,
    camera: Camera,
    compiler_options: Optional[Dict[str, str]] = None,
):
    """Jitted eval step: losses + per-stage mean 3D joint error (mm).

    Unlike the reference (which ships every batch's uvd back to the host,
    train.py:271-276), the metric is computed on device and only scalars
    leave the chip.
    """

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        # `weight` marks real (1) vs padded (0) samples in the fixed-size
        # batch; all outputs reduce to *replicated scalars* so they are
        # fetchable on multi-host runs (a per-sample sharded output would
        # span non-addressable devices).
        weight = batch.get("weight")
        if preprocess_cfg is not None:
            data = preprocess_batch(batch, jax.random.PRNGKey(0), preprocess_cfg)
        else:
            data = batch
        if weight is None:
            weight = jnp.ones(data["img"].shape[0], jnp.float32)
        weight = weight.astype(jnp.float32)

        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        results = state.apply_fn(
            variables, data["img"], data["label_img"], data["mask"], train=False
        )
        every = stage_losses(results, data, loss_cfg.lambda_h, loss_cfg.lambda_d, weight)
        loss = total_loss(every, loss_cfg.alpha)

        box = data["box_size"].astype(jnp.float32)
        com = data["com"].astype(jnp.float32)
        cube = data["cube"].astype(jnp.float32)
        true_uvd = recover_uvd(data["uvd"].astype(jnp.float32), box, com, cube)
        true_xyz = camera.uvd2xyz(true_uvd)
        err_sums = []
        for _, _, uvd in results:
            pred = recover_uvd(uvd.astype(jnp.float32), box, com, cube)
            xyz = camera.uvd2xyz(pred)
            err = jnp.sqrt(jnp.sum((xyz - true_xyz) ** 2, axis=-1))  # [B, J]
            err_sums.append(jnp.sum(jnp.mean(err, axis=-1) * weight))
        return {
            "loss": loss,
            "stage_losses": jnp.asarray(every),
            "err_sum_mm": jnp.stack(err_sums),   # [stages], weighted sums
            "count": jnp.sum(weight),
        }

    return jax.jit(step, compiler_options=compiler_options)
