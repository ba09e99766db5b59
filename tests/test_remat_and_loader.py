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


def test_loader_skip_policy_keeps_positions():
    """on_error='skip': corrupt samples become placeholder records flagged
    by decode_ok — POSITIONS are preserved (result rows are matched to the
    test list by index), and the run does not die on one bad file."""
    import numpy as np

    from pixelwiseregression_tpu.data.loader import Loader

    class FlakySource:
        lines = [f"s{i}" for i in range(6)]

        def record(self, line):
            if line in ("s1", "s4"):
                raise IOError(f"cannot decode {line}")
            return {"x": np.full(3, float(line[1:]))}

    with pytest.warns(UserWarning, match="skipping undecodable"):
        batches = list(Loader(FlakySource(), batch_size=2, num_workers=2,
                              on_error="skip"))
    # every sample keeps its row: 3 batches x 2 real samples
    assert [int(b["count"]) for b in batches] == [2, 2, 2]
    vals = [float(b["x"][i, 0]) for b in batches for i in range(2)]
    oks = [bool(b["decode_ok"][i]) for b in batches for i in range(2)]
    assert oks == [True, False, True, True, False, True]
    good_positions = [v for v, ok in zip(vals, oks) if ok]
    assert good_positions == [0.0, 2.0, 3.0, 5.0]
    # placeholders are copies of a good record (decodable by the pipeline)
    assert all(np.isfinite(b["x"]).all() for b in batches)


def test_loader_skip_policy_survives_leading_bad_batches():
    """on_error='skip' with a RUN OF LEADING corrupt files spanning whole
    batches: the loader buffers the all-bad batches until the first good
    record appears, then emits them (in order) as flagged placeholders —
    the run --skip_bad_samples was meant to protect must not die."""
    import numpy as np

    from pixelwiseregression_tpu.data.loader import Loader

    class LeadingBadSource:
        lines = [f"s{i}" for i in range(6)]

        def record(self, line):
            if line in ("s0", "s1", "s2"):  # batches 0 and half of 1 all-bad
                raise IOError(f"cannot decode {line}")
            return {"x": np.full(3, float(line[1:]))}

    with pytest.warns(UserWarning, match="skipping undecodable"):
        batches = list(Loader(LeadingBadSource(), batch_size=2, num_workers=2,
                              on_error="skip"))
    assert [int(b["count"]) for b in batches] == [2, 2, 2]
    oks = [bool(b["decode_ok"][i]) for b in batches for i in range(2)]
    assert oks == [False, False, False, True, True, True]
    vals = [float(b["x"][i, 0]) for b in batches for i in range(2)]
    assert vals[3:] == [3.0, 4.0, 5.0]  # good rows keep their positions
    assert all(np.isfinite(b["x"]).all() for b in batches)


def test_loader_skip_policy_all_bad_raises():
    """If literally every sample fails to decode there is nothing to build
    placeholders from — fail with a clear message, not a hang."""
    from pixelwiseregression_tpu.data.loader import Loader

    class AllBadSource:
        lines = ["a", "b", "c"]

        def record(self, line):
            raise IOError(f"cannot decode {line}")

    with pytest.warns(UserWarning, match="skipping undecodable"):
        with pytest.raises(RuntimeError, match="no decodable sample"):
            list(Loader(AllBadSource(), batch_size=2, num_workers=2,
                        on_error="skip"))


def test_instance_norm_custom_vjp_matches_autodiff():
    from pixelwiseregression_tpu.models.layers import _instance_norm

    def plain(x, scale, bias, eps=1e-5):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        mean_sq = jnp.mean(jnp.square(x), axis=(1, 2), keepdims=True)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + eps)
        a = inv * scale
        return x * a + (bias - mean * a)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 16, 16, 8).astype(np.float32)) * 2.0 + 0.5
    scale = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(8).astype(np.float32))
    g_out = jnp.asarray(rng.randn(3, 16, 16, 8).astype(np.float32))

    def loss(fn, x, s, b):
        return jnp.sum(fn(x, s, b) * g_out)

    y_c = _instance_norm(x, scale, bias, 1e-5)
    y_p = plain(x, scale, bias)
    # forward: the in-tree two-pass stats round differently from the plain
    # one-pass textbook form by a few ulp on well-conditioned inputs
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_p), rtol=1e-4, atol=1e-5)

    gc = jax.grad(lambda *a: loss(lambda x, s, b: _instance_norm(x, s, b, 1e-5), *a),
                  argnums=(0, 1, 2))(x, scale, bias)
    gp = jax.grad(lambda *a: loss(plain, *a), argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gc, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fullregression_remat_gradients_match():
    from pixelwiseregression_tpu.models import FullRegression

    kw = dict(joints=4, stage=2, label_size=32, features=16, norm_method="instance")
    m0 = FullRegression(remat=False, **kw)
    m1 = FullRegression(remat=True, **kw)
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)
    label = jnp.asarray(rng.rand(2, 32, 32, 1), jnp.float32)
    mask = jnp.ones((2, 32, 32, 1), jnp.float32)
    v = m0.init(jax.random.PRNGKey(0), img, label, mask, train=False)

    def loss(m, p):
        return sum(jnp.sum(u ** 2) for u in m.apply({"params": p}, img, label, mask, train=True))

    g0 = jax.grad(lambda p: loss(m0, p))(v["params"])
    g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        g0, g1,
    )


def test_instance_fast_norm_variant():
    """`--norm_method instance_fast` (one-pass stats, serving opt-in) must
    run fwd+grad and agree with the precise default on well-conditioned
    activations (they only diverge on near-constant channels)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from pixelwiseregression_tpu.models import PixelwiseRegression

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 32, 32, 1), jnp.float32)
    lab = jnp.asarray(rng.randn(2, 16, 16, 1), jnp.float32)
    msk = jnp.ones((2, 16, 16, 1), jnp.float32)
    kw = dict(joints=5, stage=1, label_size=16, features=16, level=1)
    m_p = PixelwiseRegression(norm_method="instance", **kw)
    m_f = PixelwiseRegression(norm_method="instance_fast", **kw)
    v = m_p.init(jax.random.PRNGKey(0), img, lab, msk, train=False)
    uvd_p = np.asarray(m_p.apply(v, img, lab, msk, train=False)[-1][2])
    uvd_f = np.asarray(m_f.apply(v, img, lab, msk, train=False)[-1][2])
    np.testing.assert_allclose(uvd_f, uvd_p, atol=2e-4, rtol=1e-3)
    g = jax.grad(lambda p: jnp.sum(
        m_f.apply({"params": p}, img, lab, msk, train=True)[-1][2] ** 2
    ))(v["params"])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
