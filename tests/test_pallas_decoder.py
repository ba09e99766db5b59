"""Pallas fused decoder vs XLA reference: forward + gradient equivalence.

On CPU the kernel runs in interpret mode; the same test module is also run
on real TPU hardware by scripts/tpu_check.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.ops.softargmax import soft_argmax_decode
from pixelwiseregression_tpu.ops.pallas_softargmax import soft_argmax_decode_pallas

RNG = np.random.RandomState(3)


def _inputs(b=2, h=64, w=64, j=21):
    logits = jnp.asarray(RNG.randn(b, h, w, j), jnp.float32)
    dm = jnp.asarray(RNG.randn(b, h, w, j), jnp.float32)
    label = jnp.asarray(RNG.randn(b, h, w, 1), jnp.float32)
    mask = jnp.asarray((RNG.rand(b, h, w, 1) > 0.4), jnp.float32)
    wt = jnp.asarray(RNG.rand(j) + 0.5, jnp.float32)
    return logits, dm, label, mask, wt


@pytest.mark.parametrize("j", [14, 21])
def test_forward_equivalence(j):
    logits, dm, label, mask, wt = _inputs(j=j)
    hm_ref, uvd_ref = soft_argmax_decode(logits, dm, label, mask, wt)
    hm_pal, uvd_pal = soft_argmax_decode_pallas(logits, dm, label, mask, wt)
    np.testing.assert_allclose(np.asarray(hm_pal), np.asarray(hm_ref), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(uvd_pal), np.asarray(uvd_ref), rtol=1e-5, atol=1e-6)


def test_gradient_equivalence():
    logits, dm, label, mask, wt = _inputs(b=2, j=14)

    def loss(fn, args):
        hm, uvd = fn(*args)
        # touch both outputs with asymmetric weights
        return jnp.sum(uvd ** 2) + 0.1 * jnp.sum(hm * hm) + jnp.sum(hm[..., 0])

    # grads wrt logits(0), depthmaps(1), label(2), w(4) — mask grad is
    # deliberately zero in the pallas path (binary input data)
    g_ref = jax.grad(lambda *a: loss(soft_argmax_decode, a), argnums=(0, 1, 2, 4))(
        logits, dm, label, mask, wt
    )
    g_pal = jax.grad(lambda *a: loss(soft_argmax_decode_pallas, a), argnums=(0, 1, 2, 4))(
        logits, dm, label, mask, wt
    )
    names = ["logits", "depthmaps", "label", "w"]
    for name, a, b in zip(names, g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6, err_msg=name
        )


def test_sum_method_falls_back():
    logits, dm, label, mask, _ = _inputs(j=14)
    hm_ref, uvd_ref = soft_argmax_decode(logits, dm, label, mask, None, method="sum")
    hm_pal, uvd_pal = soft_argmax_decode_pallas(logits, dm, label, mask, None, method="sum")
    np.testing.assert_allclose(np.asarray(uvd_pal), np.asarray(uvd_ref), atol=0)
