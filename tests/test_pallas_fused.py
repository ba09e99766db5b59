"""Fused conv+instance-norm Pallas kernel vs the reference XLA path.

Runs in interpret mode on CPU (conftest forces the CPU backend); the real
Mosaic compile is exercised by bench.py / tools/bench_fused_unit.py on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.ops.pallas_fused import fused_conv_norm


def _xla_conv(x, w, b, stride=1):
    k = w.shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        window_strides=(stride, stride), padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + b.astype(jnp.float32)


def _xla_norm_relu(y, scale, bias, eps=1e-5, act=jnp.bfloat16):
    y32 = y.astype(act).astype(jnp.float32)
    mean = jnp.mean(y32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    a = inv * scale
    return jnp.maximum(y32 * a + (bias - mean * a), 0.0)


def _rand(key, shape, scale=1.0):
    return scale * jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("ksize", [1, 3])
def test_epilogue_unit_matches_xla(ksize):
    k0, k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 5)
    B, H, W, C, Co = 3, 16, 16, 8, 16
    x = _rand(k0, (B, H, W, C)).astype(jnp.bfloat16)
    w = _rand(k1, (ksize, ksize, C, Co), 0.3)
    b = _rand(k2, (Co,), 0.1)
    es = 1.0 + 0.1 * _rand(k3, (Co,))
    eb = 0.1 * _rand(k4, (Co,))

    got = fused_conv_norm(x, w, b, epi_scale=es, epi_bias=eb)
    ref = _xla_norm_relu(_xla_conv(x, w, b), es, eb).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )


@pytest.mark.parametrize("ksize", [1, 3])
def test_prologue_unit_matches_xla(ksize):
    k0, k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(1), 5)
    B, H, W, C, Co = 2, 16, 16, 16, 8
    # offset + varied magnitude: exercises the two-pass var's robustness
    x = (5.0 + _rand(k0, (B, H, W, C))).astype(jnp.bfloat16)
    w = _rand(k1, (ksize, ksize, C, Co), 0.3)
    b = _rand(k2, (Co,), 0.1)
    ps = 1.0 + 0.1 * _rand(k3, (C,))
    pb = 0.1 * _rand(k4, (C,))

    got = fused_conv_norm(x, w, b, pro_scale=ps, pro_bias=pb)
    xn = _xla_norm_relu(x.astype(jnp.float32), ps, pb).astype(jnp.bfloat16)
    ref = _xla_conv(xn, w, b).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )


def test_conv_edges_exact_zero_padding():
    """Border semantics: the padded-slice conv must reproduce torch-style
    zero padding exactly (the masks must kill the circular-roll wrap)."""
    B, H, W, C, Co = 1, 8, 8, 8, 8
    x = jnp.ones((B, H, W, C), jnp.float32)
    w = jnp.ones((3, 3, C, Co), jnp.float32)
    b = jnp.zeros((Co,), jnp.float32)
    got = np.asarray(fused_conv_norm(x, w, b))[0, :, :, 0]
    # interior: 9*C, edges: 6*C, corners: 4*C
    assert got[4, 4] == 9 * C
    assert got[0, 4] == 6 * C and got[4, 0] == 6 * C
    assert got[0, 0] == 4 * C and got[-1, -1] == 4 * C
    # a horizontally-varying input catches dj-mask sign mistakes
    xv = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.float32)[None, None, :, None], (B, H, W, C)
    )
    wl = jnp.zeros((3, 3, C, Co), jnp.float32).at[1, 0].set(1.0)  # left tap
    got = np.asarray(fused_conv_norm(xv, wl, b))[0, 4, :, 0]
    ref = np.concatenate([[0.0], np.arange(W - 1, dtype=np.float32)]) * C
    np.testing.assert_allclose(got, ref)


def test_prologue_skip_unit_matches_xla_resblock_tail():
    """norm -> relu -> 1x1 conv -> + skip (the ResBlock output unit)."""
    k0, k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(3), 6)
    B, H, W, C, Co = 2, 16, 16, 8, 16
    x = (1.0 + _rand(k0, (B, H, W, C))).astype(jnp.bfloat16)
    skip = _rand(k5, (B, H, W, Co)).astype(jnp.bfloat16)
    w = _rand(k1, (1, 1, C, Co), 0.3)
    b = _rand(k2, (Co,), 0.1)
    ps = 1.0 + 0.1 * _rand(k3, (C,))
    pb = 0.1 * _rand(k4, (C,))

    got = fused_conv_norm(x, w, b, pro_scale=ps, pro_bias=pb, skip=skip)
    xn = _xla_norm_relu(x.astype(jnp.float32), ps, pb).astype(jnp.bfloat16)
    ref = (_xla_conv(xn, w, b).astype(jnp.bfloat16) + skip)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )


@pytest.mark.parametrize("bt", [1, 2])
def test_fused_chain_head_triple(bt):
    """3x (conv3 + epilogue norm) in ONE kernel == 3 XLA units chained.
    bt=2 exercises the stage-sliced sample interleaving."""
    from pixelwiseregression_tpu.ops.pallas_fused import fused_chain

    keys = jax.random.split(jax.random.PRNGKey(4), 12)
    B, H, W, C = 2, 16, 16, 8
    x = _rand(keys[0], (B, H, W, C)).astype(jnp.bfloat16)
    units = []
    ref = x
    for i in range(3):
        w = _rand(keys[4 * i + 1], (3, 3, C, C), 0.3)
        b = _rand(keys[4 * i + 2], (C,), 0.1)
        es = 1.0 + 0.1 * _rand(keys[4 * i + 3], (C,))
        eb = 0.1 * _rand(keys[4 * i + 4], (C,))
        units.append({"kernel": w, "bias": b, "epi": (es, eb)})
        ref = _xla_norm_relu(_xla_conv(ref, w, b), es, eb).astype(jnp.bfloat16)

    got = fused_chain(x, units, bt=bt)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.08, rtol=0.08,
    )


def test_fused_chain_resblock():
    """Full pre-activation ResBlock (norm->1x1, norm->3x3, norm->1x1 + x)
    in one kernel == the XLA composition (reference model.py:6-23)."""
    from pixelwiseregression_tpu.ops.pallas_fused import fused_chain

    keys = jax.random.split(jax.random.PRNGKey(5), 13)
    B, H, W, C = 2, 16, 16, 16
    Ch = C // 2
    x = (1.0 + _rand(keys[0], (B, H, W, C))).astype(jnp.bfloat16)

    shapes = [(1, C, Ch), (3, Ch, Ch), (1, Ch, C)]
    units, ref = [], x
    for i, (k, ci, co) in enumerate(shapes):
        w = _rand(keys[4 * i + 1], (k, k, ci, co), 0.3)
        b = _rand(keys[4 * i + 2], (co,), 0.1)
        ps = 1.0 + 0.1 * _rand(keys[4 * i + 3], (ci,))
        pb = 0.1 * _rand(keys[4 * i + 4], (ci,))
        units.append({"kernel": w, "bias": b, "pro": (ps, pb)})
        ref = _xla_conv(
            _xla_norm_relu(ref.astype(jnp.float32), ps, pb).astype(jnp.bfloat16),
            w, b,
        ).astype(jnp.bfloat16)
    ref = ref + x

    got = fused_chain(x, units, skip=x)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.08, rtol=0.08,
    )


def test_both_norms_unit():
    """prologue + conv + epilogue in one kernel (stem conv_1 shape)."""
    keys = jax.random.split(jax.random.PRNGKey(2), 7)
    B, H, W, C, Co = 2, 16, 16, 8, 16
    x = (2.0 + _rand(keys[0], (B, H, W, C))).astype(jnp.bfloat16)
    w = _rand(keys[1], (3, 3, C, Co), 0.3)
    b = _rand(keys[2], (Co,), 0.1)
    ps, pb = 1.0 + 0.1 * _rand(keys[3], (C,)), 0.1 * _rand(keys[4], (C,))
    es, eb = 1.0 + 0.1 * _rand(keys[5], (Co,)), 0.1 * _rand(keys[6], (Co,))

    got = fused_conv_norm(x, w, b, pro_scale=ps, pro_bias=pb,
                          epi_scale=es, epi_bias=eb)
    xn = _xla_norm_relu(x.astype(jnp.float32), ps, pb).astype(jnp.bfloat16)
    ref = _xla_norm_relu(_xla_conv(xn, w, b), es, eb).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )
