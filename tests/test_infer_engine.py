"""Golden tests: fused inference engine == model.apply (train=False)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.models import PixelwiseRegression
from pixelwiseregression_tpu.models.infer_engine import make_fused_apply
from pixelwiseregression_tpu.ops.pallas_hourglass import (
    hourglass_fused,
    num_resblocks,
    stack_hourglass_params,
)


def _make(stage=2, level=2, features=32, joints=5, b=3, dtype=jnp.float32):
    model = PixelwiseRegression(
        joints=joints, stage=stage, label_size=16, features=features,
        level=level, norm_method="instance", heatmap_method="softmax",
        decoder="xla", dtype=dtype,
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(b, 32, 32, 1), jnp.float32)
    label = jnp.asarray(rng.randn(b, 16, 16, 1), jnp.float32)
    mask = jnp.asarray((rng.rand(b, 16, 16, 1) > 0.3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, label, mask, train=False)
    return model, variables, img, label, mask


def test_fused_hourglass_matches_flax_module():
    from pixelwiseregression_tpu.models.pixelwise import Hourglass

    for level in (0, 1, 3):
        m = Hourglass(features=16, level=level, norm_method="instance")
        hw = 16
        x = jnp.asarray(np.random.RandomState(level).randn(4, hw, hw, 16), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, False)
        ref = m.apply(v, x, False)
        stacked = stack_hourglass_params(v["params"], level)
        assert stacked["w0"].shape[0] == num_resblocks(level)
        out = hourglass_fused(x, stacked, level, block_batch=2)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4
        )


def test_engine_matches_model_apply():
    model, variables, img, label, mask = _make()
    ref = model.apply(variables, img, label, mask, train=False)
    fn = jax.jit(make_fused_apply(model, variables))
    out = fn(img, label, mask)
    assert len(out) == len(ref) == 2
    # f32 reduction-order noise (9-tap accumulate vs XLA conv) is amplified
    # chaotically by instance norms on near-constant channels — stage 2's
    # input contains softmax-heatmap channels, so its maps get a loose
    # gross-bug tolerance while stage 1 stays tight. Trained-checkpoint
    # parity is the authoritative gate (test_trained_parity).
    for s, ((hm_o, dm_o, uvd_o), (hm_r, dm_r, uvd_r)) in enumerate(zip(out, ref)):
        map_tol = 1e-3 if s == 0 else 2e-2
        np.testing.assert_allclose(np.asarray(uvd_o), np.asarray(uvd_r),
                                   atol=5e-4 if s == 0 else 5e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(hm_o), np.asarray(hm_r),
                                   atol=1e-4 if s == 0 else 1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(dm_o), np.asarray(dm_r),
                                   atol=map_tol, rtol=map_tol)


def test_engine_matches_model_apply_bf16():
    # bf16 policy: engine and flax path accumulate differently at bf16, so
    # compare both against nothing stricter than bf16 resolution.
    model, variables, img, label, mask = _make(dtype=jnp.bfloat16, level=1, stage=1)
    ref = model.apply(variables, img, label, mask, train=False)
    fn = jax.jit(make_fused_apply(model, variables))
    out = fn(img, label, mask)
    np.testing.assert_allclose(
        np.asarray(out[0][2], np.float32), np.asarray(ref[0][2], np.float32),
        atol=0.02, rtol=0.02,
    )


def test_unit_engine_matches_model_apply():
    """Per-unit fused engine (conv+instance-norm Pallas kernels): same
    variables pytree, same outputs. min_res=4 forces the fused ResBlock
    path at every level the tiny test model has; features=64 gives a
    3-conv stem so the stem units run too."""
    from pixelwiseregression_tpu.models.infer_engine import make_unit_fused_apply

    model, variables, img, label, mask = _make(stage=2, features=64)
    ref = model.apply(variables, img, label, mask, train=False)
    fn = jax.jit(make_unit_fused_apply(model, variables, min_res=4))
    out = fn(img, label, mask)
    assert len(out) == len(ref) == 2
    for s, ((hm_o, dm_o, uvd_o), (hm_r, dm_r, uvd_r)) in enumerate(zip(out, ref)):
        map_tol = 1e-3 if s == 0 else 2e-2
        np.testing.assert_allclose(np.asarray(uvd_o), np.asarray(uvd_r),
                                   atol=5e-4 if s == 0 else 5e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(hm_o), np.asarray(hm_r),
                                   atol=1e-4 if s == 0 else 1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(dm_o), np.asarray(dm_r),
                                   atol=map_tol, rtol=map_tol)


def test_unit_engine_matches_model_apply_bf16():
    from pixelwiseregression_tpu.models.infer_engine import make_unit_fused_apply

    model, variables, img, label, mask = _make(dtype=jnp.bfloat16, level=1,
                                               stage=1, features=64)
    ref = model.apply(variables, img, label, mask, train=False)
    fn = jax.jit(make_unit_fused_apply(model, variables, min_res=4))
    out = fn(img, label, mask)
    # bf16 accumulation-order noise only: the engine computes two-pass
    # stats in-kernel while model.apply uses the compensated one-pass —
    # equal to ~f32 ulp, but bf16 rounding can push single decoder
    # coordinates past a tight bound
    np.testing.assert_allclose(
        np.asarray(out[0][2], np.float32), np.asarray(ref[0][2], np.float32),
        atol=0.05, rtol=0.05,
    )


def test_unit_engine_rejects_unsupported():
    from pixelwiseregression_tpu.models.infer_engine import make_unit_fused_apply

    model, variables, *_ = _make(stage=1, level=1)
    kw = dict(joints=model.joints, stage=1, label_size=16, features=32, level=1)
    with pytest.raises(ValueError):
        make_unit_fused_apply(PixelwiseRegression(norm_method="batch", **kw), variables)
    with pytest.raises(ValueError):
        make_unit_fused_apply(PixelwiseRegression(quant="int8", **kw), variables)
    with pytest.raises(ValueError):
        make_unit_fused_apply(PixelwiseRegression(kernel_size=5, **kw), variables)


def test_engine_rejects_unsupported():
    model, variables, *_ = _make(stage=1, level=1)
    kw = dict(joints=model.joints, stage=1, label_size=16, features=32, level=1)
    with pytest.raises(ValueError):
        make_fused_apply(PixelwiseRegression(norm_method="batch", **kw), variables)
    with pytest.raises(ValueError):
        make_fused_apply(PixelwiseRegression(quant="int8", **kw), variables)
