"""Fused norm+relu backward (ops/fused_normrelu.py) vs the composed chain.

Oracle: ``jax.nn.relu(_instance_norm(x, s, b, eps).astype(x.dtype))`` — the
exact per-unit chain the model applies (models/layers.py InstanceNorm +
nn.relu, reference model.py:54-65). Forward must match bit-exactly; the
three gradients must match to reduction-reassociation tolerance. The pallas
engine runs in interpret mode on CPU (same kernel code path the TPU
lowers).

Quick tier: shapes are tiny and everything is CPU-jitted once.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.models.layers import _instance_norm
from pixelwiseregression_tpu.ops.fused_normrelu import (
    make_norm_relu_pallas,
    norm_relu,
)

pytestmark = pytest.mark.quick

EPS = 1e-5


def _composed(x, scale, bias):
    y = _instance_norm(x, scale, bias, EPS)
    return jax.nn.relu(y.astype(x.dtype))


def _make(b, h, w, c, dtype, seed=0):
    kx, kr, ks, kb = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(kx, (b, h, w, c), dtype)
    r = jax.random.normal(kr, (b, h, w, c), jnp.float32)
    scale = jax.random.normal(ks, (c,), jnp.float32) * 0.2 + 1.0
    bias = jax.random.normal(kb, (c,), jnp.float32) * 0.1
    return x, r, scale, bias


def _loss(fn, x, scale, bias, r):
    return jnp.sum(fn(x, scale, bias).astype(jnp.float32) * r)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_fused_xla_matches_composed(dtype):
    x, r, scale, bias = _make(4, 8, 8, 128, dtype)
    want_y = _composed(x, scale, bias)
    got_y = norm_relu(x, scale, bias, EPS)
    assert want_y.dtype == got_y.dtype == dtype
    np.testing.assert_array_equal(np.asarray(want_y, np.float32),
                                  np.asarray(got_y, np.float32))

    grads_w = jax.grad(lambda *a: _loss(_composed, *a), argnums=(0, 1, 2))(
        x, scale, bias, r)
    grads_g = jax.grad(
        lambda x, s, b, r: _loss(lambda *a: norm_relu(*a, EPS), x, s, b, r),
        argnums=(0, 1, 2))(x, scale, bias, r)
    for w, g, tol in zip(grads_w, grads_g, (2e-2, 1e-3, 1e-3)):
        assert w.dtype == g.dtype
        np.testing.assert_allclose(np.asarray(w, np.float32),
                                   np.asarray(g, np.float32),
                                   rtol=1e-4, atol=tol)


@pytest.mark.parametrize("b,bt", [(4, 1), (4, 2), (3, 2)])  # (3,2): bt->1 fallback
def test_pallas_matches_fused_xla(b, bt):
    x, r, scale, bias = _make(b, 8, 8, 128, jnp.bfloat16, seed=1)
    f = make_norm_relu_pallas(bt=bt, interpret=True)

    got_y = f(x, scale, bias, EPS)
    np.testing.assert_array_equal(
        np.asarray(norm_relu(x, scale, bias, EPS), np.float32),
        np.asarray(got_y, np.float32))

    ref = jax.grad(
        lambda x, s, b2, r: _loss(lambda *a: norm_relu(*a, EPS), x, s, b2, r),
        argnums=(0, 1, 2))(x, scale, bias, r)
    got = jax.grad(
        lambda x, s, b2, r: _loss(lambda *a: f(*a, EPS), x, s, b2, r),
        argnums=(0, 1, 2))(x, scale, bias, r)
    for w, g, tol in zip(ref, got, (2e-2, 1e-2, 1e-2)):
        assert w.shape == g.shape and w.dtype == g.dtype
        np.testing.assert_allclose(np.asarray(w, np.float32),
                                   np.asarray(g, np.float32),
                                   rtol=1e-4, atol=tol)


def test_pallas_under_jit_and_relu_zero_subgradient():
    # jit the whole grad (the in-model usage) and pin the relu boundary
    # semantics: a channel whose normalized output is driven to exactly 0
    # contributes zero gradient (jax.nn.relu subgradient at 0 is 0).
    x, r, scale, bias = _make(2, 8, 8, 128, jnp.bfloat16, seed=2)
    scale = scale.at[0].set(0.0)
    bias = bias.at[0].set(0.0)  # channel 0: y == 0 everywhere
    f = make_norm_relu_pallas(bt=1, interpret=True)
    g = jax.jit(jax.grad(
        lambda x, s, b2: _loss(lambda *a: f(*a, EPS), x, s, b2, r),
        argnums=(0, 1, 2)))(x, scale, bias)
    assert np.all(np.asarray(g[0], np.float32)[..., 0] == 0.0)
    assert float(g[1][0]) == 0.0 and float(g[2][0]) == 0.0
    assert np.isfinite(np.asarray(g[0], np.float32)).all()
