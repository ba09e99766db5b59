"""Checkpoint-parity: reference torch model vs converted flax model.

Builds the *actual* reference PyTorch modules (from /root/reference, when
present), converts their randomly-initialized state dicts with
`pixelwiseregression_tpu.compat.torch_ckpt`, and checks that forward outputs
agree. This is the gate that released ``.pt`` checkpoints will produce the
same per-joint uvd on TPU.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from pixelwiseregression_tpu.compat.torch_ckpt import convert_state_dict
from pixelwiseregression_tpu.models import PixelwiseRegression, FullRegression

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference repo not available", allow_module_level=True)

sys.path.insert(0, REF)
import model as ref_model  # noqa: E402  (reference torch implementation)


def _rand_inputs(rng, b, j, image_size=128, label_size=64):
    img = rng.randn(b, 1, image_size, image_size).astype(np.float32)
    label = rng.randn(b, 1, label_size, label_size).astype(np.float32)
    mask = (rng.rand(b, 1, label_size, label_size) > 0.4).astype(np.float32)
    return img, label, mask


def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.mark.parametrize("heatmap_method", ["softmax", "sum"])
def test_pixelwise_forward_parity(heatmap_method):
    rng = np.random.RandomState(7)
    torch.manual_seed(7)
    joints, stage, features, level = 5, 2, 32, 2

    tm = ref_model.PixelwiseRegression(
        joints,
        stage=stage,
        label_size=64,
        features=features,
        level=level,
        norm_method="instance",
        heatmap_method=heatmap_method,
    )
    tm.eval()

    img, label, mask = _rand_inputs(rng, 2, joints)
    with torch.no_grad():
        t_results = tm(torch.from_numpy(img), torch.from_numpy(label), torch.from_numpy(mask))

    variables = convert_state_dict(tm.state_dict(), model="pixelwise")
    fm = PixelwiseRegression(
        joints=joints,
        stage=stage,
        label_size=64,
        features=features,
        level=level,
        norm_method="instance",
        heatmap_method=heatmap_method,
    )
    f_results = fm.apply(
        variables,
        jnp.asarray(_nchw_to_nhwc(img)),
        jnp.asarray(_nchw_to_nhwc(label)),
        jnp.asarray(_nchw_to_nhwc(mask)),
        train=False,
    )

    assert len(t_results) == len(f_results) == stage
    for s in range(stage):
        t_hm, t_dm, t_uvd = (x.numpy() for x in t_results[s])
        f_hm, f_dm, f_uvd = f_results[s]
        np.testing.assert_allclose(
            np.transpose(np.asarray(f_hm), (0, 3, 1, 2)), t_hm, rtol=1e-3, atol=1e-5
        )
        # raw conv outputs accumulate f32 reorder noise (~2e-4 abs over two
        # chained stages of ~40 convs); uvd below is the parity-gated output
        np.testing.assert_allclose(
            np.transpose(np.asarray(f_dm), (0, 3, 1, 2)), t_dm, rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(np.asarray(f_uvd), t_uvd, rtol=1e-3, atol=2e-5)


def test_fullregression_forward_parity():
    rng = np.random.RandomState(11)
    torch.manual_seed(11)
    joints, stage, features = 5, 2, 32

    tm = ref_model.FullRegression(
        joints, stage=stage, label_size=64, features=features, level=4, norm_method="instance"
    )
    tm.eval()

    img, label, mask = _rand_inputs(rng, 2, joints)
    with torch.no_grad():
        t_results = tm(torch.from_numpy(img), torch.from_numpy(label), torch.from_numpy(mask))

    variables = convert_state_dict(tm.state_dict(), model="fullregression")
    fm = FullRegression(joints=joints, stage=stage, label_size=64, features=features, level=4, norm_method="instance")
    f_results = fm.apply(
        variables,
        jnp.asarray(_nchw_to_nhwc(img)),
        jnp.asarray(_nchw_to_nhwc(label)),
        jnp.asarray(_nchw_to_nhwc(mask)),
        train=False,
    )

    for s in range(stage):
        t_uvd = t_results[s].numpy()
        f_uvd = np.asarray(f_results[s])
        np.testing.assert_allclose(f_uvd, t_uvd, rtol=1e-3, atol=1e-4)


def test_pixelwise_batchnorm_parity():
    """BatchNorm variant in eval mode (running stats)."""
    rng = np.random.RandomState(13)
    torch.manual_seed(13)
    joints = 4

    tm = ref_model.PixelwiseRegression(
        joints, stage=1, label_size=64, features=32, level=2, norm_method="batch"
    )
    # push some data through in train mode to move the running stats
    img, label, mask = _rand_inputs(rng, 4, joints)
    tm.train()
    with torch.no_grad():
        tm(torch.from_numpy(img), torch.from_numpy(label), torch.from_numpy(mask))
    tm.eval()
    with torch.no_grad():
        t_results = tm(torch.from_numpy(img), torch.from_numpy(label), torch.from_numpy(mask))

    variables = convert_state_dict(tm.state_dict(), model="pixelwise")
    fm = PixelwiseRegression(
        joints=joints, stage=1, label_size=64, features=32, level=2, norm_method="batch"
    )
    f_results = fm.apply(
        variables,
        jnp.asarray(_nchw_to_nhwc(img)),
        jnp.asarray(_nchw_to_nhwc(label)),
        jnp.asarray(_nchw_to_nhwc(mask)),
        train=False,
    )
    t_uvd = t_results[0][2].numpy()
    np.testing.assert_allclose(np.asarray(f_results[0][2]), t_uvd, rtol=1e-3, atol=2e-5)
