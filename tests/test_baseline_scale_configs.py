"""BASELINE.md's named scale configs, validated in their OWN dataset shapes.

BASELINE.md lists three rebuild scale targets: a single-chip ICVL pipeline,
8-chip data-parallel NYU training, and v5e-32 pod HAND17 training. The
generic multi-chip tests (tests/test_multichip.py) prove mesh correctness on
a synthetic 5-joint toy; this file runs the two multi-chip targets in their
named shapes — real fixture records through the real ``Loader``, the fused
train step (on-device preprocess + fwd/bwd + optimizer), and the eval step:

- 8-device data-parallel NYU training (14 joints, RGB-packed depth frames)
  in-process on the suite's 8 virtual CPU devices.
- 32-device pod HAND17 training (21 joints, xyz->uvd annotations) in a
  subprocess (the virtual device count is fixed per process).

The single-chip ICVL pipeline is covered end-to-end by
tests/test_cli_e2e.py::test_icvl_generic_train_test_roundtrip (full CLI
round trip), so it is not duplicated here.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def nyu_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nyu_scale"))
    script = os.path.join(os.path.dirname(__file__), "fixtures", "make_nyu_fixture.py")
    subprocess.run([sys.executable, script, root], check=True, capture_output=True)
    return root


@pytest.fixture(scope="module")
def hand17_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hand17_scale"))
    script = os.path.join(
        os.path.dirname(__file__), "fixtures", "make_hand17_fixture.py")
    subprocess.run([sys.executable, script, root], check=True, capture_output=True)
    return root


def _build_parts(dataset, root, **source_kw):
    """Source + PreprocessConfig + tiny-but-real model/state in the
    dataset's own shape (same construction idiom as
    tests/multihost_worker.py build_parts)."""
    import jax
    import jax.numpy as jnp

    from pixelwiseregression_tpu.data.preprocess import PreprocessConfig
    from pixelwiseregression_tpu.data.sources import get_source
    from pixelwiseregression_tpu.models import PixelwiseRegression
    from pixelwiseregression_tpu.train.loop import create_train_state, make_optimizer

    source = get_source(dataset, dataset="train", path=root, **source_kw)
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
    tx = make_optimizer(steps_per_epoch=10)
    sample = (
        jnp.zeros((2, ims, ims, 1)), jnp.zeros((2, ls, ls, 1)),
        jnp.zeros((2, ls, ls, 1)),
    )
    state = create_train_state(model, jax.random.PRNGKey(0), sample, tx)
    return source, cfg, state


def _loader_batch(source, global_batch, mesh, lines=None):
    from pixelwiseregression_tpu.data.loader import Loader
    from pixelwiseregression_tpu.parallel.mesh import shard_batch

    loader = Loader(source, global_batch, shuffle=False, drop_last=True,
                    num_workers=1, lines=lines)
    batch = next(iter(loader))
    batch.pop("count", None)
    return shard_batch(batch, mesh)


def _train_and_eval(source, cfg, state, batch, mesh, n_steps):
    import jax

    from pixelwiseregression_tpu.core.camera import Camera
    from pixelwiseregression_tpu.parallel.mesh import replicated
    from pixelwiseregression_tpu.train.loop import (
        LossConfig, make_eval_step, make_train_step,
    )

    state = jax.device_put(state, replicated(mesh))
    loss_cfg = LossConfig(alpha=0.5)
    train_step = make_train_step(cfg, loss_cfg, augment=False, donate=False)
    camera = Camera(fx=cfg.fx, fy=cfg.fy, halfu=cfg.halfu, halfv=cfg.halfv)
    eval_step = make_eval_step(cfg, loss_cfg, camera)
    losses = []
    with mesh:
        for i in range(n_steps):
            state, metrics = train_step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(7), i))
            losses.append(float(metrics["loss"]))
        em = eval_step(state, batch)
    count = float(em["count"])
    return losses, float(em["err_sum_mm"][-1]) / count, count


def test_nyu_8chip_data_parallel_training(nyu_root):
    """BASELINE scale config #2: 8-chip data-parallel NYU training — real
    NYU fixture records (RGB-packed depth, mat annotations, 14 joints)
    through the real Loader, batch sharded over the 8-device ('data',)
    mesh, several fused train steps + the on-device eval."""
    import jax

    from pixelwiseregression_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8, "suite contract: 8 virtual devices"
    source, cfg, state = _build_parts("NYU", nyu_root)
    assert source.joint_number == 14
    mesh = make_mesh(jax.devices())
    batch = _loader_batch(source, 8, mesh)
    losses, mean_mm, count = _train_and_eval(
        source, cfg, state, batch, mesh, n_steps=5)

    assert all(np.isfinite(l) for l in losses), losses
    # overfitting ONE global batch for 5 steps must reduce the loss
    assert losses[-1] < losses[0], losses
    assert np.isfinite(mean_mm) and mean_mm > 0
    assert count == 8.0  # every sample counted once across the mesh


def _pod_worker(root):
    """Subprocess body for the 32-device HAND17 pod test. The parent sets
    JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=32;
    the in-process config update below guards against the axon TPU plugin
    overriding the env var (CLAUDE.md 'TPU tunnel outages')."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) == 32, len(jax.devices())

    from pixelwiseregression_tpu.parallel.mesh import make_mesh

    source, cfg, state = _build_parts("HAND17", root)
    assert source.joint_number == 21
    # the fixture has ~22 train lines after the 95/5 split; tile to one
    # 32-sample global batch (1 sample per device — the pod regime)
    lines = (source.lines * 3)[:32]
    mesh = make_mesh(jax.devices())
    batch = _loader_batch(source, 32, mesh, lines=lines)
    losses, mean_mm, count = _train_and_eval(
        source, cfg, state, batch, mesh, n_steps=1)
    assert np.isfinite(losses[0]), losses
    assert np.isfinite(mean_mm) and count == 32.0
    print(f"pod32 HAND17 ok loss={losses[0]:.5f} eval_mm={mean_mm:.3f}",
          flush=True)


def test_hand17_pod32_train_step(hand17_root):
    """BASELINE scale config #3: v5e-32 pod HAND17 training — one fused
    train step + eval in HAND17's own shape (21 joints, xyz->uvd labels)
    over a 32-device mesh, in a subprocess with 32 virtual CPU devices."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PWR_PLATFORM")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=32"
    code = (
        "import sys; sys.path.insert(0, 'tests'); sys.path.insert(0, '.');\n"
        "import test_baseline_scale_configs as t;\n"
        f"t._pod_worker({hand17_root!r})\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "pod32 HAND17 ok" in proc.stdout, proc.stdout
