"""Training entry point shared by train.py / train_msra.py /
train_fullregression.py (reference: train.py:64-320).

TPU-native loop: raw host batches feed a single jitted step that fuses
on-device preprocessing (+augmentation +label synthesis) with fwd/bwd;
data-parallel over every visible chip via a ('data',) mesh; eval computes the
mean-mm metric on device; per-epoch checkpoints with best-epoch aliasing.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.cli.common import (
    apply_tpu_flags,
    model_kwargs_from_args,
    parse_compiler_opts,
    resolve_num_workers,
)
from pixelwiseregression_tpu.data.loader import Loader
from pixelwiseregression_tpu.data.preprocess import PreprocessConfig
from pixelwiseregression_tpu.data.sources import get_source
from pixelwiseregression_tpu.models import FullRegression, PixelwiseRegression
from pixelwiseregression_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from pixelwiseregression_tpu.train.checkpoint import alias_final, save_checkpoint
from pixelwiseregression_tpu.train.loop import (
    LossConfig,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from pixelwiseregression_tpu.utils.seeding import setup_seed


def _writer(log_name: str):
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(os.path.join("logs", log_name))
    except Exception as e:
        import warnings

        warnings.warn(
            f"tensorboardX unavailable ({type(e).__name__}: {e}) — training "
            "continues WITHOUT TensorBoard logging (scalars/images dropped)"
        )

        class _Null:
            def add_scalar(self, *a, **k): ...
            def add_scalars(self, *a, **k): ...
            def add_image(self, *a, **k): ...
            def add_figure(self, *a, **k): ...
            def close(self): ...
        return _Null()


def run_training(args, dataset_name: str, fullregression: bool = False, subject=None):
    apply_tpu_flags(args)
    os.makedirs("Model", exist_ok=True)

    seed = args.seed if args.seed else int(np.random.randint(0, 100000))
    setup_seed(seed)

    source_kw = dict(
        path=args.data_path,
        cube_size=None,
    )
    if subject is not None:
        source_kw["subject"] = subject

    train_split = "train" if not getattr(args, "small", False) else "small_train"
    val_split = "val" if not getattr(args, "small", False) else "small_val"
    trainset = get_source(dataset_name, dataset=train_split, **source_kw)
    valset = get_source(dataset_name, dataset=val_split, **source_kw)

    joints = trainset.joint_number
    spec = trainset.spec

    image_size = args.label_size * 2
    pp_train = PreprocessConfig(
        fx=spec.camera.fx, fy=spec.camera.fy, halfu=spec.camera.halfu, halfv=spec.camera.halfv,
        image_size=image_size, label_size=args.label_size,
        kernel_size=args.kernel_size, sigma=args.sigmoid,
        using_rotation=args.using_rotation, using_scale=args.using_scale,
        using_shift=args.using_shift, using_flip=args.using_flip,
        strict_quirks=not args.no_strict_quirks,
        aug_fallback=getattr(args, "aug_fallback", "clean"),
    )
    pp_val = PreprocessConfig(
        fx=spec.camera.fx, fy=spec.camera.fy, halfu=spec.camera.halfu, halfv=spec.camera.halfv,
        image_size=image_size, label_size=args.label_size,
        kernel_size=args.kernel_size, sigma=args.sigmoid,
    )

    num_workers = resolve_num_workers(args.num_workers)
    n_proc = jax.process_count()
    if n_proc > 1:
        # multi-host: each process loads its interleaved slice of the index
        # and per-host batches of batch_size // n_proc assemble into the
        # global batch (parallel/mesh.py shard_batch)
        from pixelwiseregression_tpu.parallel.mesh import process_local_lines

        assert args.batch_size % n_proc == 0
        local_bs = args.batch_size // n_proc
        train_loader = Loader(trainset, local_bs, shuffle=True, drop_last=True,
                              num_workers=num_workers, seed=seed,
                              lines=process_local_lines(trainset.lines))
        val_loader = Loader(valset, local_bs, shuffle=False, drop_last=False,
                            num_workers=num_workers,
                            lines=process_local_lines(valset.lines))
    else:
        train_loader = Loader(trainset, args.batch_size, shuffle=True, drop_last=True,
                              num_workers=num_workers, seed=seed)
        val_loader = Loader(valset, args.batch_size, shuffle=False, drop_last=False,
                            num_workers=num_workers)

    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    rsh = replicated(mesh)
    n_dev = mesh.devices.size
    assert args.batch_size % n_dev == 0, (
        f"batch_size {args.batch_size} must divide over {n_dev} devices"
    )
    print(f"devices: {n_dev} ({jax.devices()[0].platform}), per-chip batch "
          f"{args.batch_size // n_dev}")

    model_kw = model_kwargs_from_args(args, joints, fullregression=fullregression)
    model = (FullRegression if fullregression else PixelwiseRegression)(**model_kw)

    # global sample count (multi-host loaders hold only a process-local
    # slice) and a floor of 1 so the LR schedule never divides by zero
    steps_per_epoch = max(len(trainset.lines) // args.batch_size, 1)
    print(f"there are {steps_per_epoch} steps per epoch!")

    tx = make_optimizer(
        opt=args.opt, lr=args.lr, beta1=args.beta1, beta2=args.beta2,
        weight_decay=args.weight_decay, lr_decay=args.lr_decay,
        decay_epoch=int(args.decay_epoch), steps_per_epoch=steps_per_epoch,
    )
    sample_inputs = (
        jnp.zeros((n_dev, image_size, image_size, 1)),
        jnp.zeros((n_dev, args.label_size, args.label_size, 1)),
        jnp.zeros((n_dev, args.label_size, args.label_size, 1)),
    )
    state = create_train_state(model, jax.random.PRNGKey(seed), sample_inputs, tx)

    # resume: restore params/opt_state/step (improvement over the reference,
    # which never saves optimizer state — SURVEY.md §5)
    if getattr(args, "resume", None):
        from pixelwiseregression_tpu.train.checkpoint import load_checkpoint

        ckpt = load_checkpoint(
            args.resume, params_template=state.params, opt_state_template=state.opt_state
        )
        state = state.replace(
            params=ckpt["params"],
            batch_stats=ckpt["batch_stats"] or state.batch_stats,
            opt_state=ckpt["opt_state"] if ckpt["opt_state"] is not None else state.opt_state,
            step=jnp.asarray(ckpt["step"] or 0, jnp.int32),
        )
        print(f"resumed from {args.resume} at step {int(state.step)}")

    state = jax.device_put(state, rsh)

    loss_cfg = LossConfig(
        lambda_h=getattr(args, "lambda_h", 1.0),
        lambda_d=getattr(args, "lambda_d", 0.01),
        alpha=getattr(args, "alpha", 1.0),
    )
    copts = parse_compiler_opts(getattr(args, "compiler_opts", None))
    if fullregression:
        train_step = make_train_step_fullreg(pp_train, donate=True,
                                             compiler_options=copts)
        eval_step = make_eval_step_fullreg(pp_val, spec.camera)
    else:
        train_step = make_train_step(pp_train, loss_cfg, augment=True,
                                     compiler_options=copts)
        eval_step = make_eval_step(pp_val, loss_cfg, spec.camera)

    log_name = f"{dataset_name}_{args.suffix}"
    if subject is not None:
        log_name = f"{dataset_name}_{args.suffix}_subject{subject}"
    model_name = log_name + "_{}.ckpt"
    writer = _writer(log_name)

    model_param = dict(model_kw)
    model_param["dtype"] = str(model_param["dtype"].__name__)

    # per-epoch image logging (reference: train.py:214-228) on one val batch
    @jax.jit
    def viz_forward(state, batch):
        data = preprocess_for_viz(batch)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        results = state.apply_fn(variables, data["img"], data["label_img"], data["mask"], train=False)
        return data, results

    def preprocess_for_viz(batch):
        from pixelwiseregression_tpu.data.preprocess import preprocess_batch

        return preprocess_batch(batch, jax.random.PRNGKey(0), pp_val)

    def log_images(epoch, state, batch):
        try:
            from pixelwiseregression_tpu.utils.viz import (
                draw_features,
                draw_skeleton_normalized,
            )

            data, results = viz_forward(state, batch)
            img0 = np.asarray(data["img"][0, :, :, 0])
            writer.add_image(
                "input_image",
                np.asarray(data["img"][0]).transpose(2, 0, 1) / max(float(np.abs(img0).max()), 1e-6),
                epoch,
            )
            if not fullregression:
                writer.add_figure("input_heatmap", draw_features(np.asarray(data["heatmaps"][0])), epoch)
                writer.add_figure("input_depthmap", draw_features(np.asarray(data["dmaps"][0])), epoch)
            skel = draw_skeleton_normalized(img0, np.asarray(data["uvd"][0]), trainset.config)
            writer.add_image("input_skeleton", skel.transpose(2, 0, 1), epoch)
            for i, result in enumerate(results):
                if fullregression:
                    uvd = result
                else:
                    hm, dm, uvd = result
                    writer.add_figure(f"stage{i}_heatmap", draw_features(np.asarray(hm[0])), epoch)
                    writer.add_figure(f"stage{i}_depthmap", draw_features(np.asarray(dm[0])), epoch)
                skel = draw_skeleton_normalized(img0, np.asarray(uvd[0]), trainset.config)
                writer.add_image(f"stage{i}_skeleton", skel.transpose(2, 0, 1), epoch)
        except Exception as e:  # viz must never kill a training run
            print(f"image logging failed: {e}")

    best_epoch, best_error = 0, float("inf")
    rng = jax.random.PRNGKey(seed)
    step_count = 0
    viz_batch = None

    profile_dir = getattr(args, "profile", None)

    for epoch in range(args.epoch):
        # ---- train ----
        t0 = time.time()
        epoch_steps = 0
        for batch in train_loader:
            batch.pop("count", None)
            batch = shard_batch(batch, mesh)
            rng, sub = jax.random.split(rng)
            if profile_dir is not None and step_count == 3:
                jax.profiler.start_trace(profile_dir)
            state, metrics = train_step(state, batch, sub)
            if profile_dir is not None and step_count == 6:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), metrics
                )
                jax.profiler.stop_trace()
                print(f"profile trace written to {profile_dir}")
                profile_dir = None
            step_count += 1
            epoch_steps += 1
        train_elapsed = time.time() - t0
        if step_count == 0:
            raise RuntimeError(
                f"no training batches: {len(trainset.lines)} samples < "
                f"batch_size {args.batch_size} with drop_last"
            )
        train_loss = float(metrics["loss"])
        stage_l = np.asarray(metrics["stage_losses"])

        # ---- eval ----
        val_losses, val_errs, n_total, n_batches = None, None, 0.0, 0
        for batch in val_loader:
            batch.pop("count")
            if viz_batch is None:
                viz_batch = {k: np.asarray(v) for k, v in batch.items() if np.ndim(v)}
            batch = shard_batch(batch, mesh)
            m = eval_step(state, batch)
            # err_sum_mm/count/stage_losses are replicated scalars ->
            # fetchable on multi-host (per-sample arrays would not be)
            errs = np.asarray(m["err_sum_mm"])  # [stages]
            sl = np.asarray(m["stage_losses"])
            if val_errs is None:
                val_errs, val_losses = errs, sl
            else:
                val_errs = val_errs + errs
                val_losses = val_losses + sl
            n_total += float(m["count"])
            n_batches += 1
        val_errs = val_errs / max(n_total, 1.0)
        val_losses = val_losses / max(n_batches, 1)

        # per-epoch train-phase throughput (epoch 0 includes the one-time
        # jit compile, so later epochs are the steady-state number)
        fps = epoch_steps * args.batch_size / max(train_elapsed, 1e-9)
        print(
            f"epoch {epoch}: train_loss {train_loss:.5f}  "
            f"val mean-mm {np.array2string(val_errs, precision=3)}  "
            f"({fps:.1f} samples/s)"
        )

        # PWR_TB_IMAGES=0 skips TB image logging: each epoch's viz pulls
        # ~10 arrays device->host, which through the remote TPU tunnel
        # costs seconds per fetch — long hardware runs opt out (scalars
        # and the mean-mm metric are unaffected)
        if viz_batch is not None and os.environ.get("PWR_TB_IMAGES", "1") != "0":
            log_images(epoch, state, viz_batch)

        # ---- tensorboard scalars (reference: train.py:294-311) ----
        n_stages = stage_l.shape[0]
        val_total = float(sum(
            loss_cfg.alpha * val_losses[i][2]
            + (1 - loss_cfg.alpha) * (val_losses[i][0] + val_losses[i][1])
            for i in range(n_stages)
        )) if not fullregression else float(np.sum(val_losses))
        writer.add_scalars("loss", {"train": train_loss, "val": val_total}, epoch)
        for i in range(n_stages):
            if not fullregression:
                writer.add_scalars(f"stage{i}_heatmap_loss",
                                   {"train": float(stage_l[i][0]), "val": float(val_losses[i][0])}, epoch)
                writer.add_scalars(f"stage{i}_depthmap_loss",
                                   {"train": float(stage_l[i][1]), "val": float(val_losses[i][1])}, epoch)
                writer.add_scalars(f"stage{i}_uvd_loss",
                                   {"train": float(stage_l[i][2]), "val": float(val_losses[i][2])}, epoch)
            writer.add_scalar(f"stage{i}_result", float(val_errs[i]), epoch)

        # ---- checkpoint (reference: train.py:313-320) ----
        save_checkpoint(
            os.path.join("Model", model_name.format(epoch)),
            params=jax.device_get(state.params),
            batch_stats=jax.device_get(state.batch_stats) if state.batch_stats else None,
            seed=seed,
            model_param=model_param,
            opt_state=jax.device_get(state.opt_state),
            step=int(state.step),
        )
        if float(val_errs[-1]) < best_error:
            best_epoch = epoch
            best_error = float(val_errs[-1])

    print(f"best epoch is {best_epoch}")
    alias_final("Model", model_name, best_epoch)
    writer.close()
    return best_epoch, best_error


# ---- FullRegression variants: uvd-only loss (reference:
# train_fullregression.py:161-192) ----


def make_train_step_fullreg(preprocess_cfg, donate=True, compiler_options=None):
    import optax
    from pixelwiseregression_tpu.data.preprocess import preprocess_batch

    def step(state, batch, rng):
        data = preprocess_batch(batch, rng, preprocess_cfg, augment=True)
        sw = data["valid"].astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(sw), 1.0) * data["uvd"].shape[1]

        def loss_fn(params):
            variables = {"params": params}
            mutable = False
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = state.apply_fn(variables, data["img"], data["label_img"], data["mask"],
                                 train=True, mutable=mutable)
            results, new_vars = out if mutable else (out, {})
            uvd_t = data["uvd"].astype(jnp.float32)
            per_stage = [
                jnp.sum(jnp.sum((uvd.astype(jnp.float32) - uvd_t) ** 2, axis=2) * sw[:, None]) / denom
                for uvd in results
            ]
            loss = sum(per_stage)
            return loss, (jnp.asarray(per_stage), new_vars.get("batch_stats", state.batch_stats))

        (loss, (per_stage, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        # pad stage losses to the (h, d, u) triple shape used by the logger
        sl = jnp.stack([jnp.zeros_like(per_stage), jnp.zeros_like(per_stage), per_stage], axis=1)
        return new_state, {"loss": loss, "stage_losses": sl}

    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   compiler_options=compiler_options)


def make_eval_step_fullreg(preprocess_cfg, camera):
    from pixelwiseregression_tpu.core.camera import recover_uvd
    from pixelwiseregression_tpu.data.preprocess import preprocess_batch

    def step(state, batch):
        weight = batch.get("weight")
        data = preprocess_batch(batch, jax.random.PRNGKey(0), preprocess_cfg)
        b = data["img"].shape[0]
        w = jnp.ones(b, jnp.float32) if weight is None else weight.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(w), 1.0) * data["uvd"].shape[1]
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        results = state.apply_fn(variables, data["img"], data["label_img"], data["mask"], train=False)
        uvd_t = data["uvd"].astype(jnp.float32)
        per_stage = [
            jnp.sum(jnp.sum((u.astype(jnp.float32) - uvd_t) ** 2, axis=2) * w[:, None]) / denom
            for u in results
        ]
        loss = sum(per_stage)

        box = data["box_size"].astype(jnp.float32)
        com = data["com"].astype(jnp.float32)
        cube = data["cube"].astype(jnp.float32)
        true_xyz = camera.uvd2xyz(recover_uvd(uvd_t, box, com, cube))
        err_sums = []
        for u in results:
            xyz = camera.uvd2xyz(recover_uvd(u.astype(jnp.float32), box, com, cube))
            err = jnp.mean(jnp.sqrt(jnp.sum((xyz - true_xyz) ** 2, axis=-1)), axis=-1)
            err_sums.append(jnp.sum(err * w))
        sl = jnp.stack([jnp.zeros_like(jnp.asarray(per_stage))] * 2 + [jnp.asarray(per_stage)], axis=1)
        return {
            "loss": loss,
            "stage_losses": sl,
            "err_sum_mm": jnp.stack(err_sums),
            "count": jnp.sum(w),
        }

    return jax.jit(step)
