"""--compiler_opts plumbing: parse + per-jit compiler_options pass-through.

``compiler_options`` is the only route for ``xla_tpu_*`` knobs under the
TPU tunnel (client-side XLA_FLAGS aborts on them — tools/xla_flags_ab.py).
These tests run on CPU, so they use a debug option every backend accepts
(``xla_embed_ir_in_executable``) to prove the dict reaches the compiler.
"""

import pytest

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.cli.common import parse_compiler_opts
from pixelwiseregression_tpu.data.preprocess import PreprocessConfig
from pixelwiseregression_tpu.models import PixelwiseRegression
from pixelwiseregression_tpu.train.loop import (
    LossConfig,
    create_train_state,
    make_optimizer,
    make_train_step,
)

from test_preprocess import _synthetic_sample, _host_batch, FX, FY, HALFU, HALFV

CPU_SAFE_OPT = {"xla_embed_ir_in_executable": "True"}


def test_parse_compiler_opts():
    assert parse_compiler_opts(None) is None
    assert parse_compiler_opts("") is None
    assert parse_compiler_opts("a=1") == {"a": "1"}
    assert parse_compiler_opts("a=1, b=false") == {"a": "1", "b": "false"}
    with pytest.raises(SystemExit):
        parse_compiler_opts("novalue")
    with pytest.raises(SystemExit):
        parse_compiler_opts("a=1,=2")


def test_compiler_options_reach_the_compiler():
    # a bogus option name must be REJECTED at compile time — proof the
    # dict is forwarded, not dropped
    f = jax.jit(lambda x: x + 1,
                compiler_options={"pwr_not_a_real_xla_option": "1"})
    with pytest.raises(Exception):
        f(jnp.ones(4))


def test_train_step_accepts_compiler_options():
    model = PixelwiseRegression(joints=14, stage=1, label_size=64,
                                features=16, level=1)
    tx = make_optimizer(steps_per_epoch=100)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((2, 128, 128, 1)), jnp.zeros((2, 64, 64, 1)),
         jnp.zeros((2, 64, 64, 1))), tx,
    )
    cfg = PreprocessConfig(fx=FX, fy=FY, halfu=HALFU, halfv=HALFV)
    step = make_train_step(cfg, LossConfig(), augment=False, donate=False,
                           compiler_options=CPU_SAFE_OPT)
    batch = _host_batch([_synthetic_sample(joints=14) for _ in range(2)])
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert jnp.isfinite(metrics["loss"])
