"""BatchNorm variant: running stats update through the train step and are
used at eval (reference: train.py norm_method='batch' path)."""

import numpy as np

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.data.preprocess import PreprocessConfig
from pixelwiseregression_tpu.models import PixelwiseRegression
from pixelwiseregression_tpu.train.loop import (
    LossConfig,
    create_train_state,
    make_optimizer,
    make_train_step,
)

from test_preprocess import _synthetic_sample, _host_batch, FX, FY, HALFU, HALFV

CFG = PreprocessConfig(fx=FX, fy=FY, halfu=HALFU, halfv=HALFV)


def test_batch_stats_update():
    model = PixelwiseRegression(
        joints=14, stage=1, label_size=64, features=16, level=1, norm_method="batch"
    )
    tx = make_optimizer(steps_per_epoch=100)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        (jnp.zeros((2, 128, 128, 1)), jnp.zeros((2, 64, 64, 1)), jnp.zeros((2, 64, 64, 1))),
        tx,
    )
    assert state.batch_stats, "batch norm must create batch_stats"
    before = jax.tree_util.tree_map(np.asarray, state.batch_stats)

    batch = _host_batch([_synthetic_sample() for _ in range(8)])
    step = make_train_step(CFG, LossConfig(alpha=1.0), augment=False, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))

    after = state.batch_stats
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(jnp.asarray(a) - jnp.asarray(b)))), before, after
    )
    total_move = sum(jax.tree_util.tree_leaves(moved))
    assert np.isfinite(float(metrics["loss"]))
    assert total_move > 0, "running stats did not update during training"
