"""End-to-end parity: on-device preprocess_batch vs a numpy/cv2 oracle that
reproduces the reference's clean-path process_single_data semantics
(reference: datasets.py:185-403)."""

import numpy as np
import cv2
import pytest

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.data.preprocess import PreprocessConfig, preprocess_batch

RNG = np.random.RandomState(42)

FX, FY, HALFU, HALFV = 588.037, 587.075, 320.0, 240.0
H, W = 480, 640
IMS, LS, KSIZE, SIGMA = 128, 64, 7, 1.5


def _synthetic_sample(joints=14, cube=150.0):
    """A blob-like synthetic hand at a random depth with joints inside it."""
    com_z = RNG.uniform(700, 900)
    cu = RNG.uniform(200, 440)
    cv_ = RNG.uniform(150, 330)
    frame = np.zeros((H, W), np.float64)
    yy, xx = np.mgrid[0:H, 0:W]
    r2 = ((xx - cu) / 60.0) ** 2 + ((yy - cv_) / 60.0) ** 2
    blob = r2 < 1.0
    frame[blob] = com_z + 80.0 * (r2[blob] - 0.5)
    # scatter some background clutter outside the cube
    n = 500
    ys, xs = RNG.randint(0, H, n), RNG.randint(0, W, n)
    frame[ys, xs] = RNG.uniform(200, 2000, n)

    com = np.array([cu, cv_, com_z])
    j_u = RNG.uniform(cu - 40, cu + 40, joints)
    j_v = RNG.uniform(cv_ - 40, cv_ + 40, joints)
    j_d = RNG.uniform(com_z - 60, com_z + 60, joints)
    joints_uvd = np.stack([j_u, j_v, j_d], 1)
    return frame, joints_uvd, com, cube


def _bbox(com, cube, margin):
    du = (cube - margin) / com[2] * FX
    dv = (cube - margin) / com[2] * FY
    left = max(int(com[0] - du), 0)
    top = max(int(com[1] - dv), 0)
    right = min(int(com[0] + du), int(HALFU * 2))
    bottom = min(int(com[1] + dv), int(HALFV * 2))
    return left, top, right, bottom


def _oracle(frame, joints_uvd, com, cube, bbox):
    """Reference clean-path semantics in numpy/cv2 (datasets.py:185-403 with
    the NYU-style load-time bbox+cube masking of datasets.py:841-857)."""
    image = frame.copy()
    mm = np.zeros_like(image)
    left, top, right, bottom = bbox
    mm[top:bottom, left:right] = 1
    image = image * mm
    image = image * np.logical_and(image < com[2] + cube, image > com[2] - cube)

    com = com.copy()
    du = cube / com[2] * FX
    dv = cube / com[2] * FY
    box_size = max(int(du + dv), 2)
    s = box_size // 2
    r, c = int(com[1]), int(com[0])
    dimg = np.pad(image, ((s, s), (s, s)), "constant")
    crop = dimg[r : r + 2 * s, c : c + 2 * s]
    crop = crop * np.logical_and(crop > com[2] - cube, crop < com[2] + cube)
    crop[crop > 0] -= com[2]
    com[0], com[1] = int(com[0]), int(com[1])
    box_size = crop.shape[0]

    img = cv2.resize(crop.astype(np.float32), (IMS, IMS))
    label = cv2.resize(img, (LS, LS))
    mask = (label != 0).astype(float)

    uvd_c = joints_uvd - com
    uvd_r = uvd_c.copy()
    uvd_r[:, :2] = uvd_r[:, :2] / (box_size - 1) * (IMS - 1)
    uvd_k = uvd_r.copy()
    uvd_k[:, :2] = uvd_k[:, :2] / (IMS - 1) * (LS - 1) + LS // 2

    hms, dmaps = [], []
    for j in range(joints_uvd.shape[0]):
        hm = np.zeros((LS, LS))
        u, v = uvd_k[j, 0], uvd_k[j, 1]
        lu, lv = int(np.floor(u)), int(np.floor(v))
        du_, dv_ = u - lu, v - lv
        mind = max(du_ + dv_ - 1, 0)
        maxd = min(du_, dv_)
        d = (maxd + mind) / 2
        hm[lv, lu] = 1 + d - du_ - dv_
        hm[lv, lu + 1] = du_ - d
        hm[lv + 1, lu] = dv_ - d
        hm[lv + 1, lu + 1] = d
        hm = cv2.GaussianBlur(hm, (KSIZE, KSIZE), SIGMA)
        hms.append(hm)
        heatmask = (hm > 0).astype(float) * mask
        dmaps.append((uvd_r[j, 2] - label) * heatmask)

    nimg = img / cube
    nlabel = label / cube
    ndmap = np.stack(dmaps) / cube
    nuvd = uvd_r.copy()
    nuvd[:, :2] /= IMS - 1
    nuvd[:, 2] /= cube
    return {
        "img": nimg,
        "label_img": nlabel,
        "mask": mask,
        "heatmaps": np.stack(hms),
        "dmaps": ndmap,
        "uvd": nuvd,
        "box_size": float(box_size),
        "com": com.astype(np.float64),
    }


def _host_batch(samples, margin=40):
    """Host-side exact int precompute, as data.sources does."""
    out = {k: [] for k in ["frame", "joints", "com", "com_int", "cube", "bbox", "crop_top", "crop_left", "box_size"]}
    for frame, joints_uvd, com, cube in samples:
        du = cube / com[2] * FX
        dv = cube / com[2] * FY
        box = max(int(du + dv), 2)
        s = box // 2
        out["frame"].append(frame.astype(np.float32))
        out["joints"].append(joints_uvd.astype(np.float32))
        out["com"].append(com.astype(np.float32))
        out["com_int"].append(np.array([int(com[0]), int(com[1])], np.int32))
        out["cube"].append(np.float32(cube))
        out["bbox"].append(np.array(_bbox(com, cube, margin), np.int32))
        out["crop_top"].append(np.int32(int(com[1]) - s))
        out["crop_left"].append(np.int32(int(com[0]) - s))
        out["box_size"].append(np.int32(2 * s))
    return {k: jnp.asarray(np.stack(v)) for k, v in out.items()}


CFG = PreprocessConfig(fx=FX, fy=FY, halfu=HALFU, halfv=HALFV)


def test_clean_path_matches_oracle():
    samples = [_synthetic_sample() for _ in range(4)]
    batch = _host_batch(samples)
    got = preprocess_batch(batch, jax.random.PRNGKey(0), CFG)

    assert bool(jnp.all(got["valid"]))
    for i, (frame, joints_uvd, com, cube) in enumerate(samples):
        want = _oracle(frame, joints_uvd, com, cube, _bbox(com, cube, 40))
        np.testing.assert_allclose(np.asarray(got["img"][i, :, :, 0]), want["img"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["label_img"][i, :, :, 0]), want["label_img"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["mask"][i, :, :, 0]), want["mask"], atol=0)
        np.testing.assert_allclose(
            np.transpose(np.asarray(got["heatmaps"][i]), (2, 0, 1)), want["heatmaps"], rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(got["dmaps"][i]), (2, 0, 1)), want["dmaps"], rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(got["uvd"][i]), want["uvd"], rtol=1e-4, atol=1e-6)
        assert float(got["box_size"][i]) == want["box_size"]
        np.testing.assert_allclose(np.asarray(got["com"][i]), want["com"], rtol=1e-6)


def test_test_only_mode():
    samples = [_synthetic_sample() for _ in range(2)]
    batch = {k: v for k, v in _host_batch(samples).items() if k != "joints"}
    got = preprocess_batch(batch, jax.random.PRNGKey(0), CFG, test_only=True)
    for i, (frame, joints_uvd, com, cube) in enumerate(samples):
        want = _oracle(frame, joints_uvd, com, cube, _bbox(com, cube, 40))
        np.testing.assert_allclose(np.asarray(got["img"][i, :, :, 0]), want["img"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["mask"][i, :, :, 0]), want["mask"], atol=0)
    assert "uvd" not in got


def test_augmented_path_valid_and_shaped():
    """Augmentation is random (parity-ungated); check shapes, validity and
    that augmented samples actually differ from clean ones."""
    cfg = PreprocessConfig(
        fx=FX, fy=FY, halfu=HALFU, halfv=HALFV,
        using_rotation=True, using_scale=True, using_shift=True,
    )
    samples = [_synthetic_sample() for _ in range(4)]
    batch = _host_batch(samples)
    clean = preprocess_batch(batch, jax.random.PRNGKey(1), cfg)
    aug = preprocess_batch(batch, jax.random.PRNGKey(1), cfg, augment=True)
    assert aug["img"].shape == (4, IMS, IMS, 1)
    assert aug["heatmaps"].shape == (4, LS, LS, 14)
    assert bool(jnp.all(aug["valid"]))
    assert float(jnp.max(jnp.abs(aug["img"] - clean["img"]))) > 1e-3


def test_flip_quirk_partial_fallback():
    """strict_quirks + using_flip: the reference's NameError fires only when
    the flip coin lands (datasets.py:262-267), so ~half the samples fall
    back to the clean path and the rest stay augmented (never flipped)."""
    cfg = PreprocessConfig(
        fx=FX, fy=FY, halfu=HALFU, halfv=HALFV,
        using_rotation=True, using_flip=True,
    )
    samples = [_synthetic_sample() for _ in range(8)]
    batch = _host_batch(samples)
    clean = preprocess_batch(batch, jax.random.PRNGKey(2), cfg)
    aug = preprocess_batch(batch, jax.random.PRNGKey(2), cfg, augment=True)
    diffs = np.asarray(jnp.sum(jnp.abs(aug["img"] - clean["img"]), axis=(1, 2, 3)))
    fell_back = diffs < 1e-6
    assert fell_back.any() and not fell_back.all()


def test_no_strict_quirks_fixes_rotation_flag():
    """With strict_quirks=False and using_rotation=False, no rotation is
    applied even though other augmentations run (the reference would always
    rotate — utils.py:72-73)."""
    base = dict(fx=FX, fy=FY, halfu=HALFU, halfv=HALFV,
                using_rotation=False, using_scale=False, using_shift=False)
    cfg_fixed = PreprocessConfig(**base, using_flip=False, strict_quirks=False)
    samples = [_synthetic_sample() for _ in range(2)]
    batch = _host_batch(samples)
    # no aug flags at all -> augmented call equals clean call
    clean = preprocess_batch(batch, jax.random.PRNGKey(3), cfg_fixed)
    aug = preprocess_batch(batch, jax.random.PRNGKey(3), cfg_fixed, augment=True)
    np.testing.assert_allclose(np.asarray(aug["img"]), np.asarray(clean["img"]), atol=0)


def test_no_strict_quirks_flip_works():
    """strict_quirks=False + using_flip=True actually flips (fixing the
    reference's dead flip path). With a fixed key, at least one sample in a
    batch should flip and mirror its u coordinates."""
    cfg = PreprocessConfig(fx=FX, fy=FY, halfu=HALFU, halfv=HALFV,
                           using_flip=True, strict_quirks=False)
    samples = [_synthetic_sample() for _ in range(8)]
    batch = _host_batch(samples)
    clean = preprocess_batch(batch, jax.random.PRNGKey(5), cfg)
    aug = preprocess_batch(batch, jax.random.PRNGKey(5), cfg, augment=True)
    assert bool(jnp.all(aug["valid"]))
    diffs = np.asarray(jnp.sum(jnp.abs(aug["img"] - clean["img"]), axis=(1, 2, 3)))
    flipped = diffs > 1e-3
    assert flipped.any() and not flipped.all()  # ~50% flip probability
    # flipped samples: u coordinates mirrored (uvd u sign negated)
    u_clean = np.asarray(clean["uvd"][:, :, 0])
    u_aug = np.asarray(aug["uvd"][:, :, 0])
    i = int(np.argmax(flipped))
    np.testing.assert_allclose(u_aug[i], -u_clean[i], rtol=1e-4, atol=1e-5)


def test_aug_fallback_drop():
    """aug_fallback='drop': augmented outputs only; failed augmentations are
    masked invalid instead of falling back to the clean sample."""
    cfg = PreprocessConfig(
        fx=FX, fy=FY, halfu=HALFU, halfv=HALFV,
        using_rotation=True, using_scale=True, using_shift=True,
        aug_fallback="drop",
    )
    samples = [_synthetic_sample() for _ in range(4)]
    batch = _host_batch(samples)
    out = preprocess_batch(batch, jax.random.PRNGKey(7), cfg, augment=True)
    assert out["img"].shape == (4, IMS, IMS, 1)
    assert bool(jnp.all(out["valid"]))  # blob joints are well inside the crop

    # strict flip + drop: the coin-failed samples become invalid
    cfg_flip = PreprocessConfig(
        fx=FX, fy=FY, halfu=HALFU, halfv=HALFV,
        using_flip=True, aug_fallback="drop",
    )
    samples8 = [_synthetic_sample() for _ in range(8)]
    out8 = preprocess_batch(_host_batch(samples8), jax.random.PRNGKey(8),
                            cfg_flip, augment=True)
    valid = np.asarray(out8["valid"])
    assert valid.any() and not valid.all()
