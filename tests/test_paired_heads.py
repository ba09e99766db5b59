"""Paired plane+depth head evaluation must be bit-identical to the plain
per-head graph, for every norm method and pairing strategy, on the SAME
parameter tree (models/paired_heads.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.models import PixelwiseRegression


def _build(norm_method, **kw):
    return PixelwiseRegression(
        joints=5, stage=2, label_size=32, features=32, level=2,
        norm_method=norm_method, heatmap_method="softmax", decoder="xla",
        dtype=jnp.float32, **kw)


def _inputs(b=2, s=32):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, 2 * s, 2 * s, 1), jnp.float32)
    label = jnp.asarray(rng.rand(b, s, s, 1), jnp.float32)
    mask = jnp.asarray((rng.rand(b, s, s, 1) > 0.3), jnp.float32)
    return img, label, mask


def _calibrate_anchors(variables):
    """Give the anchored norm nonzero calibrated anchors so the paired path
    exercises the real anchored branch (zeros would mask an anchor bug)."""
    if "batch_stats" not in variables:
        return variables
    rng = np.random.RandomState(1)

    def fill(path, leaf):
        name = path[-1].key
        if name == "anchor":
            return jnp.asarray(rng.randn(*leaf.shape) * 0.1, leaf.dtype)
        if name == "anchor_n":
            return jnp.full(leaf.shape, 3.0, leaf.dtype)
        return leaf

    bs = jax.tree_util.tree_map_with_path(fill, variables["batch_stats"])
    return {**variables, "batch_stats": bs}


@pytest.mark.parametrize("norm_method",
                         ["instance", "instance_fast", "instance_anchored"])
@pytest.mark.parametrize("mid,final", [("separate", "blockdiag"),
                                       ("grouped", "blockdiag"),
                                       ("grouped", "separate"),
                                       ("separate", "separate")])
def test_paired_equals_separate(norm_method, mid, final):
    base = _build(norm_method, paired_heads=False)
    inputs = _inputs()
    variables = _calibrate_anchors(
        base.init(jax.random.PRNGKey(0), *inputs, train=False))

    ref = base.apply(variables, *inputs, train=False)
    paired = _build(norm_method, paired_heads=True,
                    paired_mid=mid, paired_final=final)
    got = paired.apply(variables, *inputs, train=False)

    for stage, (r, g) in enumerate(zip(ref, got)):
        for name, a, b in zip(("heatmaps", "depthmaps", "uvd"), r, g):
            msg = f"stage {stage} {name} ({norm_method},{mid},{final})"
            if final == "separate":
                # identical contractions in identical order -> bitwise
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                              err_msg=msg)
            else:
                # blockdiag conv_3: the zero blocks contribute exact zeros,
                # but the backend may reassociate the (unchanged) nonzero
                # terms of the larger-K contraction — ~1 ulp on CPU f32,
                # amplified ~10-30x through the stage-2 chain
                # (tools/stage2_amplification.py); uvd is the product that
                # feeds every parity gate, maps are intermediate
                atol = 2e-5 if name == "uvd" else 1e-4
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-2, atol=atol, err_msg=msg)


def test_paired_anchored_fallback_without_batch_stats():
    """A torch-converted checkpoint has no batch_stats anchors: the paired
    path must fall back to exact two-pass statistics exactly like the
    module path does (layers.InstanceNorm's has_variable branch)."""
    base = _build("instance_anchored", paired_heads=False)
    inputs = _inputs()
    variables = dict(base.init(jax.random.PRNGKey(0), *inputs, train=False))
    variables.pop("batch_stats", None)  # simulate a converted .pt tree

    ref = base.apply(variables, *inputs, train=False)
    paired = _build("instance_anchored", paired_heads=True,
                    paired_mid="separate", paired_final="separate")
    got = paired.apply(variables, *inputs, train=False)
    for stage, (r, g) in enumerate(zip(ref, got)):
        for name, a, b in zip(("heatmaps", "depthmaps", "uvd"), r, g):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"stage {stage} {name} (anchored fallback)")


def test_paired_off_for_training_and_quant():
    """Training (and init) must take the module path — the anchored norm's
    EMA updates live there; quant keeps its calibration plumbing."""
    model = _build("instance_anchored")
    inputs = _inputs()
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    # train=True with mutable batch_stats: paired path has no EMA update,
    # so anchors must still move through the module path
    _, updated = model.apply(variables, *inputs, train=True,
                             mutable=["batch_stats"])
    n_after = updated["batch_stats"]["stage_0"]["plane"]["norm_0"]["anchor_n"]
    assert float(n_after) == 1.0
