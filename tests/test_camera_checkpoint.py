"""Camera transform and checkpoint round-trip unit tests."""

import pytest

pytestmark = pytest.mark.quick

import numpy as np

import jax
import jax.numpy as jnp
import optax

from pixelwiseregression_tpu.core.camera import Camera, recover_uvd
from pixelwiseregression_tpu.train.checkpoint import load_checkpoint, save_checkpoint

CAM = Camera(fx=588.037, fy=587.075, halfu=320.0, halfv=240.0)


def test_camera_roundtrip_host_float64():
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-200, 200, (7, 14, 3))
    xyz[:, :, 2] = rng.uniform(500, 900, (7, 14))
    uvd = CAM.xyz2uvd(xyz)
    back = CAM.uvd2xyz(uvd)
    assert isinstance(uvd, np.ndarray) and uvd.dtype == np.float64
    np.testing.assert_allclose(back, xyz, rtol=1e-12)


def test_camera_roundtrip_device():
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.uniform(-100, 100, (4, 21, 3)).astype(np.float32))
    xyz = xyz.at[:, :, 2].set(600.0)
    back = jax.jit(lambda x: CAM.uvd2xyz(CAM.xyz2uvd(x)))(xyz)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xyz), rtol=1e-5)


def test_recover_uvd_matches_reference_semantics():
    """recover_uvd: uv * (box-1), d * cube, + com (utils.py:332-337)."""
    rng = np.random.RandomState(2)
    uvd = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 14, 3)).astype(np.float32))
    box = jnp.asarray([150.0, 180.0, 200.0])
    cube = jnp.asarray([150.0, 150.0, 125.0])
    com = jnp.asarray(rng.uniform(100, 400, (3, 3)).astype(np.float32))
    out = np.asarray(recover_uvd(uvd, box, com, cube))
    u = np.asarray(uvd)
    for i in range(3):
        want_uv = u[i, :, :2] * (float(box[i]) - 1) + np.asarray(com)[i, :2]
        want_d = u[i, :, 2] * float(cube[i]) + float(com[i, 2])
        np.testing.assert_allclose(out[i, :, :2], want_uv, rtol=1e-5)
        np.testing.assert_allclose(out[i, :, 2], want_d, rtol=1e-5)


def test_checkpoint_roundtrip_with_opt_state(tmp_path):
    params = {"layer": {"kernel": np.arange(12.0, dtype=np.float32).reshape(3, 4),
                        "bias": np.ones(4, np.float32)}}
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    path = str(tmp_path / "x.ckpt")
    save_checkpoint(path, params=params, seed=42,
                    model_param={"stage": 2}, opt_state=opt_state, step=7)

    out = load_checkpoint(path, params_template=params, opt_state_template=opt_state)
    np.testing.assert_array_equal(out["params"]["layer"]["kernel"], params["layer"]["kernel"])
    assert out["seed"] == 42
    assert out["model_param"] == {"stage": 2}
    assert out["step"] == 7
    assert out["opt_state"] is not None
    # optimizer moments restored with the same structure
    flat_a = jax.tree_util.tree_leaves(out["opt_state"])
    flat_b = jax.tree_util.tree_leaves(opt_state)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
