"""Golden tests: XLA image ops vs OpenCV (the reference's pixel backend)."""

import numpy as np
import cv2
import pytest

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.ops.image import (
    crop_resize,
    resize_bilinear,
    warp_affine_inverse,
    rotation_matrix_inverse,
    gaussian_kernel_1d,
    gaussian_blur,
)

RNG = np.random.RandomState(0)


def _rand_img(h, w, scale=1000.0):
    return (RNG.rand(h, w) * scale).astype(np.float32)


@pytest.mark.parametrize("src,dst", [(180, 128), (128, 64), (37, 128), (128, 128), (2, 128), (300, 64)])
def test_resize_bilinear_matches_cv2(src, dst):
    img = _rand_img(src, src)
    want = cv2.resize(img, (dst, dst), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear(jnp.asarray(img), dst, dst))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)


def test_resize_rectangular():
    img = _rand_img(240, 320)
    want = cv2.resize(img, (64, 128), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear(jnp.asarray(img), 128, 64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)


def _center_crop_ref(img, center_rc, window):
    """Reference center_crop semantics (utils.py:167-173): pad by window//2,
    slice [r:r+2s, c:c+2s] from the padded image."""
    r, c = int(center_rc[0]), int(center_rc[1])
    s = window // 2
    dimg = np.pad(img, ((s, s), (s, s)), "constant", constant_values=0)
    return dimg[r : r + 2 * s, c : c + 2 * s]


@pytest.mark.parametrize(
    "h,w,center,box",
    [
        (240, 320, (120.7, 160.2), 180),
        (240, 320, (10.0, 5.0), 90),      # crop spills over top-left
        (240, 320, (235.0, 315.0), 120),  # crop spills over bottom-right
        (480, 640, (200.4, 400.9), 260),
        (240, 320, (120.0, 160.0), 2),    # minimum box
        # NOTE: negative int(center) is NOT covered: the reference's padded
        # slice produces an empty crop there and the sample is rejected
        # (utils.py:167-173 + the resize-error path at datasets.py:272-275).
    ],
)
def test_crop_resize_matches_cv2_pipeline(h, w, center, box):
    img = _rand_img(h, w)
    crop = _center_crop_ref(img, center, box)
    want = cv2.resize(crop, (128, 128), interpolation=cv2.INTER_LINEAR)

    s = box // 2
    top = int(center[0]) - s
    left = int(center[1]) - s
    got = np.asarray(crop_resize(jnp.asarray(img), top, left, 2 * s, 128))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)


def test_crop_resize_traced_scalars():
    """crop params may be traced int32 scalars inside jit."""
    img = _rand_img(240, 320)
    f = jax.jit(lambda fr, t, l, s: crop_resize(fr, t, l, s, 128))
    got = np.asarray(f(jnp.asarray(img), jnp.int32(30), jnp.int32(40), jnp.int32(150)))
    crop = _center_crop_ref(img, (30 + 75, 40 + 75), 150)
    want = cv2.resize(crop, (128, 128), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)


@pytest.mark.parametrize("angle,scale", [(17.3, 1.0), (-29.9, 0.85), (5.0, 1.2), (0.0, 1.0)])
def test_warp_affine_matches_cv2(angle, scale):
    size = 128
    img = _rand_img(size, size)
    m = cv2.getRotationMatrix2D((size // 2, size // 2), angle, scale)
    want = cv2.warpAffine(img, m, (size, size))

    minv = rotation_matrix_inverse(
        jnp.float32(angle), jnp.float32(scale), jnp.float32(size // 2), jnp.float32(size // 2)
    )
    got = np.asarray(warp_affine_inverse(jnp.asarray(img), minv))
    # cv2 >= 4.8 uses unquantized float coords for float images; remaining
    # diffs are f32 coordinate noise (~1e-5 px) on a 1000-range image.
    np.testing.assert_allclose(got, want, rtol=0, atol=0.1)
    assert np.mean(np.abs(got - want)) < 0.01


def test_gaussian_kernel_matches_cv2():
    want = cv2.getGaussianKernel(7, 1.5).ravel()
    got = gaussian_kernel_1d(7, 1.5)
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("k,sigma", [(7, 1.5), (3, 1.5), (7, 0.8)])
def test_gaussian_blur_matches_cv2(k, sigma):
    img = _rand_img(64, 64, scale=1.0)
    want = cv2.GaussianBlur(img, (k, k), sigma)
    got = np.asarray(gaussian_blur(jnp.asarray(img), k, sigma))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_gaussian_blur_batched():
    imgs = RNG.rand(5, 64, 64).astype(np.float32)
    want = np.stack([cv2.GaussianBlur(i, (7, 7), 1.5) for i in imgs])
    got = np.asarray(gaussian_blur(jnp.asarray(imgs), 7, 1.5))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
