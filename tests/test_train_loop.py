"""End-to-end slice: fused preprocess + model + loss overfits synthetic data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.core.camera import Camera
from pixelwiseregression_tpu.data.preprocess import PreprocessConfig
from pixelwiseregression_tpu.models import PixelwiseRegression
from pixelwiseregression_tpu.train.loop import (
    LossConfig,
    create_train_state,
    make_optimizer,
    make_train_step,
    make_eval_step,
)

from test_preprocess import _synthetic_sample, _host_batch, FX, FY, HALFU, HALFV

JOINTS = 14
CFG = PreprocessConfig(fx=FX, fy=FY, halfu=HALFU, halfv=HALFV)
CAM = Camera(fx=FX, fy=FY, halfu=HALFU, halfv=HALFV)


def _tiny_model():
    return PixelwiseRegression(joints=JOINTS, stage=1, label_size=64, features=32, level=2)


def test_overfit_synthetic_batch():
    model = _tiny_model()
    tx = make_optimizer(lr=1e-3, steps_per_epoch=10_000)
    rng = jax.random.PRNGKey(0)
    sample_inputs = (
        jnp.zeros((2, 128, 128, 1)),
        jnp.zeros((2, 64, 64, 1)),
        jnp.zeros((2, 64, 64, 1)),
    )
    state = create_train_state(model, rng, sample_inputs, tx)

    batch = _host_batch([_synthetic_sample(joints=JOINTS) for _ in range(8)])
    # alpha=0.5 exercises heatmap/depthmap losses too
    step = make_train_step(CFG, LossConfig(alpha=0.5), augment=False, donate=False)

    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, f"no overfit: {losses[0]} -> {losses[-1]}"


def test_eval_step_metric():
    model = _tiny_model()
    tx = make_optimizer(steps_per_epoch=100)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        (jnp.zeros((2, 128, 128, 1)), jnp.zeros((2, 64, 64, 1)), jnp.zeros((2, 64, 64, 1))),
        tx,
    )
    batch = _host_batch([_synthetic_sample(joints=JOINTS) for _ in range(4)])
    ev = make_eval_step(CFG, LossConfig(), CAM)
    m = ev(state, batch)
    assert m["err_sum_mm"].shape == (1,)
    assert float(m["count"]) == 4
    err = float(m["err_sum_mm"][0]) / 4
    assert np.isfinite(err) and 0 < err < 1000

    # padded samples (weight=0) must not contribute to the metric
    batch_w = dict(batch)
    batch_w["weight"] = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    m2 = ev(state, batch_w)
    assert float(m2["count"]) == 2
    assert float(m2["err_sum_mm"][0]) < float(m["err_sum_mm"][0])
