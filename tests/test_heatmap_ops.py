"""Golden tests for label synthesis vs a numpy oracle with reference semantics."""

import numpy as np
import cv2
import pytest

pytestmark = pytest.mark.quick

import jax.numpy as jnp

from pixelwiseregression_tpu.ops.heatmap import com_filter, splat_heatmap, synthesize_labels

RNG = np.random.RandomState(1)


def _com_filter_oracle(size_u, size_v):
    """Oracle for reference utils.py:24-35 (loop form)."""
    cu, cv_ = size_u // 2, size_v // 2
    f = np.zeros((size_v, size_u, 2))
    for i in range(size_v):
        for j in range(size_u):
            f[i, j, 0] = (j - cu) / (size_u - 1)
            f[i, j, 1] = (i - cv_) / (size_v - 1)
    return f


def _splat_oracle(size, u, v):
    """Oracle replicating reference utils.py:37-62 exactly (incl. numpy
    negative-index wrap). Returns (heatmap, ok)."""
    hm = np.zeros((size, size))
    lu, lv = int(np.floor(u)), int(np.floor(v))
    du, dv = u - lu, v - lv
    min_d = max(du + dv - 1, 0)
    max_d = min(du, dv)
    d = (max_d + min_d) / 2
    b, c = du - d, dv - d
    a = 1 + d - du - dv
    try:
        hm[lv, lu] = a
        hm[lv, lu + 1] = b
        hm[lv + 1, lu] = c
        hm[lv + 1, lu + 1] = d
        return hm, True
    except IndexError:
        return np.zeros((size, size)), False


def test_com_filter_matches_oracle():
    got = com_filter(64, 64)          # [2, H, W]
    want = _com_filter_oracle(64, 64)  # [H, W, 2]
    np.testing.assert_allclose(got[0], want[:, :, 0], rtol=1e-12)
    np.testing.assert_allclose(got[1], want[:, :, 1], rtol=1e-12)


@pytest.mark.parametrize(
    "u,v",
    [
        (31.3, 40.7),
        (0.0, 0.0),
        (62.99, 62.99),
        (62.0, 10.0),     # integer u at the last valid cell
        (-0.4, 20.0),     # floor -1 -> numpy wrap to column 63
        (-1.7, -2.3),     # both negative, wrapping
        (63.2, 10.0),     # lu + 1 = 64 -> IndexError in reference
        (10.0, 63.0),     # lv + 1 = 64 -> IndexError
        (5.5, 5.5),
    ],
)
def test_splat_matches_oracle(u, v):
    want, ok = _splat_oracle(64, u, v)
    got, valid = splat_heatmap(64, u, v)
    assert bool(valid) == ok
    # device path takes float32 coordinates (the oracle uses float64);
    # sub-pixel weights differ by O(1e-6) — negligible vs. the 0.1 mm gate
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=5e-6)


def test_splat_mass_conserved():
    got, valid = splat_heatmap(64, 31.25, 12.75)
    assert bool(valid)
    np.testing.assert_allclose(float(jnp.sum(got)), 1.0, rtol=1e-6)


def test_synthesize_labels_matches_reference_pipeline():
    """End-to-end label synthesis for one sample vs the reference recipe
    (datasets.py:287-299, 369-375) reproduced with numpy + cv2."""
    label_size, ksize, sigma, joints = 64, 7, 1.5, 5
    label_img = (RNG.rand(label_size, label_size) * 2 - 1).astype(np.float32)
    label_img[RNG.rand(label_size, label_size) < 0.3] = 0.0
    uvd = np.stack(
        [
            RNG.uniform(1, 62, size=joints),
            RNG.uniform(1, 62, size=joints),
            RNG.uniform(-1, 1, size=joints),
        ],
        axis=1,
    ).astype(np.float32)

    # oracle
    mask_o = (label_img != 0).astype(float)
    hms_o, dmaps_o = [], []
    for j in range(joints):
        hm, ok = _splat_oracle(label_size, uvd[j, 0], uvd[j, 1])
        assert ok
        hm = cv2.GaussianBlur(hm, (ksize, ksize), sigma)
        hms_o.append(hm)
        heatmask = (hm > 0).astype(float) * mask_o
        dmaps_o.append((uvd[j, 2] - label_img) * heatmask)

    hms, dmaps, mask, valid = synthesize_labels(
        jnp.asarray(uvd[:, :2]),
        jnp.asarray(uvd[:, 2]),
        jnp.asarray(label_img),
        label_size,
        ksize,
        sigma,
    )
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(mask), mask_o, atol=0)
    np.testing.assert_allclose(np.asarray(hms), np.stack(hms_o), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dmaps), np.stack(dmaps_o), rtol=1e-4, atol=1e-5)
