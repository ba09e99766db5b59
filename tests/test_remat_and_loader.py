"""Remat grad-equivalence and loader failure propagation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.models import PixelwiseRegression


def test_remat_gradients_match():
    kw = dict(joints=4, stage=2, label_size=32, features=16, level=1,
              norm_method="instance")
    m0 = PixelwiseRegression(remat=False, **kw)
    m1 = PixelwiseRegression(remat=True, **kw)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)
    label = jnp.asarray(rng.rand(2, 32, 32, 1), jnp.float32)
    mask = jnp.asarray((rng.rand(2, 32, 32, 1) > 0.3), jnp.float32)
    v = m0.init(jax.random.PRNGKey(0), img, label, mask, train=False)

    def loss(m, p):
        results = m.apply({"params": p}, img, label, mask, train=True)
        return sum(jnp.sum(u ** 2) for _, _, u in results)

    g0 = jax.grad(lambda p: loss(m0, p))(v["params"])
    g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        g0, g1,
    )


def test_loader_surfaces_decode_errors():
    from pixelwiseregression_tpu.data.loader import Loader

    class BrokenSource:
        lines = ["a", "b", "c"]

        def record(self, line):
            raise IOError(f"cannot decode {line}")

    loader = Loader(BrokenSource(), batch_size=2, num_workers=2)
    with pytest.raises(IOError, match="cannot decode"):
        list(loader)
