"""Compensated one-pass instance-norm statistics vs float64 ground truth.

(The compensated form is a correctness REFERENCE, not the shipped default:
its TwoSum reduce does not fuse into the producing conv on current XLA/TPU
so it measured slower than plain two-pass — see layers.py. These tests pin
down that its numerics are two-pass-grade, so it is ready if reduce fusion
improves.)

The round-1 plain one-pass var = E[x^2]-E[x]^2 loses ~eps*mean^2 of
absolute accuracy to f32 representation alone — catastrophic on
near-constant channels (depth-crop backgrounds, dead ReLUs), measured as
~20 mm of trained-checkpoint drift. The round-3 compensated form
(models/layers.py:_instance_norm_fwd_comp) must match the float64 two-pass
variance to ~f32 ulp of the TRUE variance on exactly those channels.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.models.layers import (
    _instance_norm_fwd,        # the default: literal two-pass (torch)
    _instance_norm_fwd_comp,   # compensated one-pass (exactness reference)
)


def _var64(x):
    x64 = np.asarray(x, np.float64)
    m = x64.mean(axis=(1, 2), keepdims=True)
    return np.square(x64 - m).mean(axis=(1, 2)), m[:, 0, 0, :]


def _adversarial(B=2, H=64, W=64, C=8, seed=0):
    """Channels spanning the failure regimes: large mean + tiny variance
    (the killer), exactly-constant, normal, large dynamic range."""
    rng = np.random.RandomState(seed)
    x = np.empty((B, H, W, C), np.float32)
    # means chosen so mean^2 is NOT f32-representable (mid-ulp): the f32
    # rounding of E[x^2] alone then carries ~ulp(mean^2) >> true var
    x[..., 0] = 100.7 + 1e-3 * rng.randn(B, H, W)    # near-constant, big mean
    x[..., 1] = 30.1 + 1e-4 * rng.randn(B, H, W)     # var ~ 1e-8 << eps
    x[..., 2] = 7.25                                  # exactly constant
    x[..., 3] = rng.randn(B, H, W)                    # ordinary
    x[..., 4] = 1000.0 * rng.randn(B, H, W)           # large range
    x[..., 5] = -50.3 + 0.01 * rng.randn(B, H, W)    # negative mean
    x[..., 6] = 400.3 + rng.randn(B, H, W)           # depth-like (mm/cube)
    x[..., 7] = np.where(rng.rand(B, H, W) > 0.7,
                         600.0, 0.0)                  # crop-mask bimodal
    # bf16-representable values: the model feeds bf16 activations
    return jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32)


@pytest.mark.parametrize("hw", [(64, 64), (128, 128), (8, 8)])
def test_compensated_var_matches_float64(hw):
    H, W = hw
    x = _adversarial(H=H, W=W)
    scale = jnp.ones((x.shape[-1],), jnp.float32)
    bias = jnp.zeros((x.shape[-1],), jnp.float32)
    eps = 1e-5

    _, (_, mean_c, inv_c, _) = _instance_norm_fwd_comp(x, scale, bias, eps)
    var_t, mean_t = _var64(x)
    inv_t = 1.0 / np.sqrt(var_t + eps)

    # inv (what multiplies the activation) must match float64 to f32 noise;
    # the plain one-pass form is off by up to ~2.5x here
    inv_c = np.asarray(inv_c)[:, 0, 0, :]
    np.testing.assert_allclose(inv_c, inv_t, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(mean_c)[:, 0, 0, :], mean_t, rtol=1e-6, atol=1e-5
    )


def test_plain_onepass_would_fail_here():
    """Meta-test: the adversarial fixture genuinely kills the naive form
    under sequential f32 accumulation (a summation order XLA is free to
    pick — the round-2 failure mode). Guards against the fixture silently
    becoming too easy. The compensated reduce is order-insensitive, so it
    passes test_compensated_var_matches_float64 regardless."""
    x = np.asarray(_adversarial(), np.float32)
    B, H, W, C = x.shape
    n = H * W
    flat = x.reshape(B, n, C)
    var_naive = np.empty((B, C), np.float32)
    for b in range(B):
        for c in range(C):
            s1 = np.float32(0.0)
            s2 = np.float32(0.0)
            for v in flat[b, :, c]:
                s1 = np.float32(s1 + v)
                s2 = np.float32(s2 + np.float32(v * v))
            m = np.float32(s1 / n)
            var_naive[b, c] = max(np.float32(s2 / n) - np.float32(m * m), 0.0)
    var_t, _ = _var64(x)
    inv_naive = 1.0 / np.sqrt(var_naive + 1e-5)
    inv_t = 1.0 / np.sqrt(var_t + 1e-5)
    assert np.max(np.abs(inv_naive / inv_t - 1.0)) > 0.2


def test_compensated_matches_twopass_form_everywhere():
    """On ordinary activations both forms agree to f32 noise (the
    compensated path replaces two-pass as the default; same interface)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(5 + rng.randn(3, 32, 32, 16), jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.randn(16), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(16), jnp.float32)
    y_c, (_, m_c, i_c, _) = _instance_norm_fwd_comp(x, scale, bias, 1e-5)
    y_t, (_, m_t, i_t, _) = _instance_norm_fwd(x, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_c), np.asarray(i_t), rtol=1e-5)


def test_odd_size_falls_back_to_twopass():
    rng = np.random.RandomState(2)
    x = jnp.asarray(100 + 1e-3 * rng.randn(2, 6, 6, 4), jnp.float32)
    scale = jnp.ones((4,), jnp.float32)
    bias = jnp.zeros((4,), jnp.float32)
    y_c, (_, _, i_c, _) = _instance_norm_fwd_comp(x, scale, bias, 1e-5)
    var_t, _ = _var64(x)
    np.testing.assert_allclose(
        np.asarray(i_c)[:, 0, 0, :], 1.0 / np.sqrt(var_t + 1e-5), rtol=2e-5
    )


def test_default_twopass_matches_float64():
    """The shipped default (literal two-pass) is itself f64-grade on the
    adversarial fixture (regression guard for the parity-critical path)."""
    x = _adversarial()
    scale = jnp.ones((x.shape[-1],), jnp.float32)
    bias = jnp.zeros((x.shape[-1],), jnp.float32)
    _, (_, _, inv_d, _) = _instance_norm_fwd(x, scale, bias, 1e-5)
    var_t, _ = _var64(x)
    np.testing.assert_allclose(
        np.asarray(inv_d)[:, 0, 0, :], 1.0 / np.sqrt(var_t + 1e-5), rtol=2e-5
    )
