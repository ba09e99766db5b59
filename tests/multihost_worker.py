"""Worker process for the REAL multi-host feed test (tests/test_multihost.py).

Executes 1 of N processes under ``jax.distributed.initialize`` on the CPU
backend with 4 virtual devices per process: the coordinator handshake, the
process-local Loader slice (`parallel/mesh.py process_local_lines`), global
batch assembly via ``jax.make_array_from_process_local_data`` (the
`shard_batch` multi-host branch that tests/test_mesh.py could only simulate
single-process), then ONE fused train step + the eval step on the global
8-device mesh — with the gradient psum and the replicated-scalar metric
fetches crossing real process boundaries.

Writes the replicated-scalar metrics as JSON for the parent test to compare
against the identical single-process 8-device run.

Usage: python multihost_worker.py <port> <process_id> <num_processes>
                                  <data_path> <out_json>
The parent sets JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=4 in the environment.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GLOBAL_BATCH = 8

# exit code + JSON field the parent test treats as "this toolchain cannot
# run multi-process CPU collectives" (the documented-blocker skip path).
# The worker classifies its OWN exception — not the parent grepping a
# stderr blob where one worker's real bug drowns in the other's grpc
# stall noise (round-5 review finding).
BLOCKER_EXIT = 42

# error shapes that mean "the backend genuinely lacks the capability".
# Deliberately NARROW: DEADLINE_EXCEEDED / UNAVAILABLE are absent because
# that is what a worker sees when its PEER crashed mid-collective — a
# real-code-failure shape that must hard-fail the parent test.
_BLOCKER_TOKENS = (
    "UNIMPLEMENTED", "not implemented", "unsupported",
    "no cpu collectives", "collectives implementation",
)


def _blocker(msg, out_json):
    with open(out_json, "w") as f:
        json.dump({"toolchain_blocker": msg[:2000]}, f)
    print(f"TOOLCHAIN_BLOCKER: {msg[:500]}", file=sys.stderr, flush=True)
    sys.exit(BLOCKER_EXIT)


def build_parts(data_path):
    """Source + PreprocessConfig + tiny-but-real model/state, shared by the
    workers and the parent's single-process reference run (identical
    construction is what makes the equivalence assertion meaningful)."""
    import jax
    import jax.numpy as jnp

    from pixelwiseregression_tpu.data.preprocess import PreprocessConfig
    from pixelwiseregression_tpu.data.sources import get_source
    from pixelwiseregression_tpu.models import PixelwiseRegression
    from pixelwiseregression_tpu.train.loop import create_train_state, make_optimizer

    source = get_source("MSRA", dataset="train", subject=0, path=data_path)
    spec = source.spec
    ims, ls = 32, 16
    cfg = PreprocessConfig(
        fx=spec.camera.fx, fy=spec.camera.fy,
        halfu=spec.camera.halfu, halfv=spec.camera.halfv,
        image_size=ims, label_size=ls, kernel_size=7, sigma=1.5,
    )
    model = PixelwiseRegression(
        joints=source.joint_number, stage=1, label_size=ls, features=16,
        level=2, norm_method="instance_anchored", decoder="xla",
    )
    # SGD without momentum: post-step params are init - lr*grad, so any
    # cross-process psum disagreement shows up undamped in the eval metrics
    tx = make_optimizer(opt="sgd", beta1=0.0, steps_per_epoch=10)
    sample = (
        jnp.zeros((2, ims, ims, 1)), jnp.zeros((2, ls, ls, 1)),
        jnp.zeros((2, ls, ls, 1)),
    )
    state = create_train_state(model, jax.random.PRNGKey(0), sample, tx)
    return source, cfg, state


def run_steps(source, cfg, state, batch):
    """One fused train step + one eval step on the global mesh; returns the
    replicated-scalar metrics (the only things fetchable on multi-host)."""
    import jax

    from pixelwiseregression_tpu.core.camera import Camera
    from pixelwiseregression_tpu.parallel.mesh import make_mesh, replicated
    from pixelwiseregression_tpu.train.loop import (
        LossConfig,
        make_eval_step,
        make_train_step,
    )

    mesh = make_mesh()
    state = jax.device_put(state, replicated(mesh))
    loss_cfg = LossConfig(alpha=0.5)
    train_step = make_train_step(cfg, loss_cfg, augment=False, donate=False)
    camera = Camera(fx=cfg.fx, fy=cfg.fy, halfu=cfg.halfu, halfv=cfg.halfv)
    eval_step = make_eval_step(cfg, loss_cfg, camera)
    with mesh:
        state, metrics = train_step(state, batch, jax.random.PRNGKey(7))
        m = eval_step(state, batch)
    return {
        "train_loss": float(metrics["loss"]),
        "eval_loss": float(m["loss"]),
        "eval_err_mm": float(m["err_sum_mm"][-1]) / float(m["count"]),
        "eval_count": float(m["count"]),
    }


def main():
    port, pid, nproc, data_path, out_json = sys.argv[1:6]
    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS from the environment —
    # the only reliable escape hatch is the in-process config update BEFORE
    # first device use (same as tests/conftest.py / __graft_entry__.py)
    jax.config.update("jax_platforms", "cpu")
    # CPU cross-process collectives (jax 0.9: gloo is the CPU default once
    # distributed is initialized; the config knob is version-dependent)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=int(nproc),
            process_id=int(pid),
            initialization_timeout=120,
        )
    except Exception as e:  # noqa: BLE001 — classified, then re-raised
        # no user code runs before initialize: any failure here is the
        # environment (coordinator/gloo/port), not a regression in ours
        _blocker(f"jax.distributed.initialize failed: {type(e).__name__}: {e}",
                 out_json)
    assert jax.process_count() == int(nproc), jax.process_count()

    from pixelwiseregression_tpu.data.loader import Loader
    from pixelwiseregression_tpu.parallel.mesh import process_local_lines, shard_batch
    from pixelwiseregression_tpu.parallel.mesh import make_mesh

    source, cfg, state = build_parts(data_path)
    local_bs = GLOBAL_BATCH // int(nproc)
    # the exact multi-host branch of cli/train_main.py run_training
    loader = Loader(source, local_bs, shuffle=False, drop_last=True,
                    num_workers=1, lines=process_local_lines(source.lines))
    batch = next(iter(loader))
    batch.pop("count", None)
    try:
        # make_array_from_process_local_data + the psum-carrying steps:
        # the only lines that exercise cross-process collectives
        batch = shard_batch(batch, make_mesh())
        result = run_steps(source, cfg, state, batch)
    except Exception as e:  # noqa: BLE001 — classified, then re-raised
        msg = f"{type(e).__name__}: {e}"
        if any(tok.lower() in msg.lower() for tok in _BLOCKER_TOKENS):
            _blocker(f"cross-process collective unsupported: {msg}", out_json)
        raise  # anything else is a real failure — full traceback to stderr
    result.update(
        process_id=int(pid),
        process_count=jax.process_count(),
        global_devices=jax.device_count(),
        local_devices=jax.local_device_count(),
    )
    with open(out_json, "w") as f:
        json.dump(result, f)
    print(f"worker {pid} ok: {result}", flush=True)


if __name__ == "__main__":
    main()
