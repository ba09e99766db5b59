"""int8 inference quantization path (models/layers.py:_Int8Conv2D).

The quantized model must (a) keep a parameter tree byte-identical to the
full-precision model so one checkpoint serves both paths, (b) be exact when
weights/activations lie on the int8 grid, and (c) refuse to train (round()
has zero gradient).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.models import PixelwiseRegression
from pixelwiseregression_tpu.models.layers import _Int8Conv2D


def test_int8_conv_exact_on_grid():
    """With weights/activations exactly on the int8 grid the quantized conv
    must reproduce the f32 convolution to f32 rounding."""
    rng = np.random.RandomState(0)
    cin, cout, k = 8, 16, 3
    # per-channel scales; force max |q| = 127 in every output channel so
    # s_w equals the chosen scale exactly
    s_w = rng.uniform(0.01, 0.1, cout).astype(np.float32)
    w_int = rng.randint(-127, 128, (k, k, cin, cout))
    w_int[0, 0, 0, :] = 127
    kernel = (w_int * s_w).astype(np.float32)

    s_a = 0.05
    x_int = rng.randint(-127, 128, (2, 10, 10, cin))
    x_int[:, 0, 0, 0] = 127
    x = (x_int * s_a).astype(np.float32)

    bias = rng.randn(cout).astype(np.float32)

    mod = _Int8Conv2D(features=cout, kernel_size=k, stride=1)
    out = mod.apply({"params": {"kernel": kernel, "bias": bias}}, jnp.asarray(x))

    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kernel), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def small_model_io():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 32, 32, 1), jnp.float32)
    lab = jnp.asarray(rng.rand(2, 16, 16, 1), jnp.float32)
    msk = jnp.asarray((rng.rand(2, 16, 16, 1) > 0.3), jnp.float32)
    return img, lab, msk


def _model(quant):
    return PixelwiseRegression(
        joints=5, stage=2, label_size=16, features=32, level=2,
        norm_method="instance", heatmap_method="softmax", decoder="xla",
        quant=quant,
    )


@pytest.mark.parametrize(
    "quant", ["int8", "int8_all", "int8_heads", "int8_static", "int8_static_all"]
)
def test_quant_param_tree_identical_and_forward(quant, small_model_io):
    img, lab, msk = small_model_io
    m0, mq = _model(None), _model(quant)
    v0 = m0.init(jax.random.PRNGKey(0), img, lab, msk, train=False)
    vq = mq.init(jax.random.PRNGKey(0), img, lab, msk, train=False)
    assert jax.tree_util.tree_structure(v0["params"]) == jax.tree_util.tree_structure(
        vq["params"]
    )
    for (k0, a), (kq, b) in zip(
        jax.tree_util.tree_leaves_with_path(v0["params"]),
        jax.tree_util.tree_leaves_with_path(vq["params"]),
    ):
        assert jax.tree_util.keystr(k0) == jax.tree_util.keystr(kq)
        assert a.shape == b.shape and a.dtype == b.dtype

    # the f32 params drive the quantized forward directly
    variables = {"params": v0["params"]}
    if "static" in quant:
        _, upd = mq.apply(variables, img, lab, msk, train=False, mutable=["quant_scales"])
        assert all(
            float(np.asarray(s).max()) > 0
            for s in jax.tree_util.tree_leaves(upd["quant_scales"])
        ), "calibration must observe a positive absmax on every quantized conv"
        variables = dict(variables, **upd)
    res = mq.apply(variables, img, lab, msk, train=False)
    assert len(res) == 2
    hm, dm, uvd = res[-1]
    assert np.isfinite(np.asarray(uvd)).all()
    # heatmaps stay normalized distributions (decoder runs full precision)
    sums = np.asarray(jnp.sum(hm.astype(jnp.float32), axis=(1, 2)))
    np.testing.assert_allclose(sums, 1.0, atol=1e-3)


def test_quant_refuses_training(small_model_io):
    img, lab, msk = small_model_io
    mq = _model("int8")
    v = mq.init(jax.random.PRNGKey(0), img, lab, msk, train=False)
    with pytest.raises(ValueError, match="inference-only"):
        mq.apply(v, img, lab, msk, train=True)


def test_static_quant_requires_calibration(small_model_io):
    """Applying a static-scale model without a calibrated ``quant_scales``
    collection must fail loudly, not silently use a garbage scale."""
    img, lab, msk = small_model_io
    mq = _model("int8_static")
    v = mq.init(jax.random.PRNGKey(0), img, lab, msk, train=False)
    with pytest.raises(Exception, match="quant_scales"):
        mq.apply({"params": v["params"]}, img, lab, msk, train=False)


def test_cli_quant_plumbing():
    from pixelwiseregression_tpu.cli.common import make_test_parser, model_kwargs_from_args

    p = make_test_parser()
    args = p.parse_args(["--quant", "int8"])
    kw = model_kwargs_from_args(args, joints=14)
    assert kw["quant"] == "int8"
    args = p.parse_args([])
    assert model_kwargs_from_args(args, joints=14)["quant"] is None


def test_int8_static_accuracy_on_trained_batchnorm_model():
    """Accuracy gate for the serving config that actually profits from int8
    (batch norm folds to a constant affine at inference — PERF.md): train a
    tiny model briefly, then int8_static_all with multi-batch per-channel
    calibration must track the f32 uvd closely. Catches calibration/scale
    regressions (e.g. the old single-batch scalar absmax)."""
    import optax

    rng = np.random.RandomState(0)
    b, ims, ls, joints = 16, 32, 16, 5
    img = jnp.asarray(rng.rand(b, ims, ims, 1) * 0.5, jnp.float32)
    label = jnp.asarray(rng.rand(b, ls, ls, 1) * 0.5, jnp.float32)
    mask = jnp.asarray((rng.rand(b, ls, ls, 1) > 0.3), jnp.float32)
    uvd_t = jnp.asarray(rng.uniform(-0.3, 0.3, (b, joints, 3)), jnp.float32)

    kw = dict(joints=joints, stage=1, label_size=ls, features=16, level=1,
              norm_method="batch", heatmap_method="softmax", decoder="xla")
    model = PixelwiseRegression(**kw)
    variables = model.init(jax.random.PRNGKey(0), img, label, mask, train=False)
    params, bs = variables["params"], variables["batch_stats"]

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bs, opt_state):
        def loss_fn(p):
            out, newv = model.apply(
                {"params": p, "batch_stats": bs}, img, label, mask,
                train=True, mutable=["batch_stats"])
            uvd = out[-1][2]
            return jnp.mean(jnp.sum((uvd - uvd_t) ** 2, -1)), newv["batch_stats"]
        (l, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, nopt = tx.update(g, opt_state, params)
        return optax.apply_updates(params, up), nbs, nopt, l

    for _ in range(40):
        params, bs, opt_state, loss = step(params, bs, opt_state)
    assert np.isfinite(float(loss))

    trained = {"params": params, "batch_stats": bs}
    uvd_f32 = np.asarray(model.apply(trained, img, label, mask, train=False)[-1][2])

    mq = PixelwiseRegression(quant="int8_static_all", **kw)
    _, upd = mq.apply(trained, img, label, mask, train=False,
                      mutable=["quant_scales"])
    qvars = dict(trained, **upd)
    # second calibration batch keeps the running per-channel max honest
    _, upd2 = mq.apply(qvars, img[::-1] * 1.1, label, mask, train=False,
                       mutable=["quant_scales"])
    qvars = dict(qvars, **upd2)
    uvd_q = np.asarray(mq.apply(qvars, img, label, mask, train=False)[-1][2])

    d = np.abs(uvd_q - uvd_f32)
    # normalized units: u/v in [0,1]-ish crop coords, d in cube units.
    # 0.02 normalized ~ 1-2 px / a few mm — gross-regression bound for a
    # tiny 40-step model; the real-mm gate runs on the TPU fixture ckpt.
    assert d.max() < 0.02, f"int8_static_all drifted: max {d.max():.4f}"
    assert d.mean() < 0.005, f"int8_static_all drifted: mean {d.mean():.4f}"
