"""On-device batched preprocessing + label synthesis.

TPU-native replacement for the reference's per-sample CPU pipeline
(reference: datasets.py:185-403, which runs inside torch DataLoader workers
with cv2/numpy). Here the whole thing — background masking, COM centering,
perspective crop, resize, augmentation, Gaussian-heatmap / depth-map label
synthesis and normalization — is a single jit-compiled, vmapped XLA program
with fully static shapes, so it fuses into the train step and the hourglass
never stalls on host preprocessing.

Division of labor:
  * The host (`pixelwiseregression_tpu.data.sources`) decodes raw frames and
    computes the handful of *exact integer* crop parameters in float64
    (``box_size = int(du + dv)`` etc., reference: datasets.py:244-259) —
    these feed normalization denominators, so float32 truncation boundaries
    must match the reference bit-for-bit.
  * The device does all pixel work and the (random, parity-ungated)
    augmentation arithmetic in float32.

Clean (non-augmented) path — the checkpoint-parity path:
  1. background bbox mask (reference: datasets.py:666-681, 841-857),
  2. depth-cube mask + COM depth centering (datasets.py:251-254),
  3. fused crop+resize gather to ``image_size`` (datasets.py:250, 271),
  4. label image = resize to ``label_size``; mask = nonzero (283-299),
  5. heatmap splat + Gaussian blur; Dmaps; normalization (287-383).

Augmented path (train only) replicates the reference's semantics including
its quirks (documented inline): rotation is *always* applied when any
augmentation flag is on; with ``using_flip`` the ~50% of samples whose flip
coin lands true hit the reference's NameError (datasets.py:267) and fall
back to the clean path, while the rest stay augmented (un-flipped).
Per-sample fallback on failed heatmap splats mirrors the reference's
try/except (datasets.py:292-301) via a select.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.ops.image import (
    crop_resize,
    resize_bilinear,
    rotation_matrix_inverse,
    warp_affine_inverse,
)
from pixelwiseregression_tpu.ops.heatmap import synthesize_labels


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Static preprocessing parameters (hashable -> usable as a jit static)."""

    fx: float
    fy: float
    halfu: float
    halfv: float
    image_size: int = 128
    label_size: int = 64
    kernel_size: int = 7
    sigma: float = 1.5
    using_rotation: bool = False
    using_scale: bool = False
    using_shift: bool = False
    using_flip: bool = False
    # Replicate reference quirks exactly (see module docstring). When False:
    # rotation honors using_rotation, and using_flip actually flips.
    strict_quirks: bool = True
    # What happens to a sample whose augmentation fails (heatmap splat out of
    # range / degenerate crop / strict-quirk flip): "clean" reproduces the
    # reference's fallback to the unaugmented sample (costs a second full
    # label-synthesis path); "drop" masks the sample out of the loss instead
    # and skips computing the clean path entirely (faster; failures are <1%
    # on real data).
    aug_fallback: str = "clean"

    @property
    def augmentation(self) -> bool:
        return self.using_rotation or self.using_scale or self.using_shift or self.using_flip


def _mask_and_center(frame, bbox, com_z, cube):
    """bbox mask + depth-cube mask + COM depth centering on the full frame.

    These per-pixel ops commute with the crop gather, so they run once on the
    raw frame and both clean/augmented crops sample the same result.
    """
    h, w = frame.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    left, top, right, bottom = bbox[0], bbox[1], bbox[2], bbox[3]
    inside = (
        (rows >= top) & (rows < bottom) & (cols >= left) & (cols < right)
    ).astype(frame.dtype)
    f = frame * inside
    in_cube = (f > com_z - cube) & (f < com_z + cube)
    f = f * in_cube.astype(frame.dtype)
    return jnp.where(f > 0, f - com_z, 0.0)


def _labels_from_crop(img, uvd_centered, box_size, cube, cfg: PreprocessConfig):
    """Steps 4-5: label image, mask, heatmaps, dmaps, normalized uvd, valid."""
    ls, ims = cfg.label_size, cfg.image_size
    label_img = resize_bilinear(img, ls, ls)

    uvd_resized_uv = uvd_centered[:, :2] / (box_size - 1.0) * (ims - 1.0)
    uvd_kernel = uvd_resized_uv / (ims - 1.0) * (ls - 1.0) + (ls // 2)

    heatmaps, dmaps, mask, valid_j = synthesize_labels(
        uvd_kernel, uvd_centered[:, 2], label_img, ls, cfg.kernel_size, cfg.sigma
    )

    norm_uvd = jnp.concatenate(
        [uvd_resized_uv / (ims - 1.0), uvd_centered[:, 2:3] / cube], axis=1
    )
    valid = jnp.all(valid_j) & (jnp.sum(mask) >= 10)
    return label_img, mask, heatmaps, dmaps, norm_uvd, valid


def _process_one(
    frame,
    joints_uvd,
    com,
    com_int,
    cube,
    bbox,
    crop_top,
    crop_left,
    box_size,
    key,
    cfg: PreprocessConfig,
    test_only: bool,
    augment: bool,
):
    """Process a single sample. All args traced; cfg/test_only/augment static."""
    h, w = frame.shape
    ims, ls = cfg.image_size, cfg.label_size
    com_z = com[2]
    cube_f = cube.astype(jnp.float32)

    centered = _mask_and_center(frame, bbox, com_z, cube_f)
    box_f = box_size.astype(jnp.float32)

    # ---------- clean path ----------
    img_c = crop_resize(centered, crop_top, crop_left, box_size, ims)
    com_c = jnp.stack([com_int[0].astype(jnp.float32), com_int[1].astype(jnp.float32), com_z])

    if test_only:
        label_c = resize_bilinear(img_c, ls, ls)
        mask_c = (label_c != 0).astype(jnp.float32)
        return {
            "img": (img_c / cube_f)[:, :, None],
            "label_img": (label_c / cube_f)[:, :, None],
            "mask": mask_c[:, :, None],
            "box_size": box_f,
            "cube": cube_f,
            "com": com_c,
        }

    use_aug = augment and cfg.augmentation
    drop_fallback = use_aug and cfg.aug_fallback == "drop"

    if not drop_fallback:
        uvd_centered_c = joints_uvd - com_c[None, :]
        label_c, mask_c, hm_c, dm_c, uvd_c, valid_c = _labels_from_crop(
            img_c, uvd_centered_c, box_f, cube_f, cfg
        )
        out_c = {
            "img": img_c,
            "label_img": label_c,
            "mask": mask_c,
            "heatmaps": hm_c,
            "dmaps": dm_c,
            "uvd": uvd_c,
            "com": com_c,
            "valid": valid_c,
        }

    if use_aug:
        k_angle, k_scale, k_shift, k_flip = jax.random.split(key, 4)

        # QUIRK(parity): random_rotated ignores its angle argument and always
        # redraws uniform(-30, 30) (utils.py:72-73), so rotation applies
        # whenever ANY augmentation flag is on, regardless of using_rotation.
        if cfg.strict_quirks or cfg.using_rotation:
            angle = jax.random.uniform(k_angle, (), jnp.float32, -30.0, 30.0)
        else:
            angle = jnp.float32(0.0)
        if cfg.using_scale:
            scale = jax.random.uniform(k_scale, (), jnp.float32, 0.8, 1.2)
        else:
            scale = jnp.float32(1.0)

        com_a = com
        if cfg.using_shift:
            shift = jax.random.uniform(k_shift, (2,), jnp.float32, -5.0, 5.0)
            # shift in world xy; z (and hence box size) is unchanged
            # (datasets.py:234-241).
            gx = (com[0] - cfg.halfu) / cfg.fx * com_z + shift[0]
            gy = (com[1] - cfg.halfv) / cfg.fy * com_z + shift[1]
            com_a = jnp.stack([gx * cfg.fx / com_z + cfg.halfu, gy * cfg.fy / com_z + cfg.halfv, com_z])

        com_a_int = jnp.trunc(com_a[:2]).astype(jnp.int32)
        s_half = box_size // 2
        top_a = com_a_int[1] - s_half
        left_a = com_a_int[0] - s_half
        img_a = crop_resize(centered, top_a, left_a, box_size, ims)

        # rotate+scale about the image center (utils.py:74-76), then scale
        # the *values* (hand size in depth) (datasets.py:284-285).
        minv = rotation_matrix_inverse(angle, scale, jnp.float32(ims // 2), jnp.float32(ims // 2))
        img_a = warp_affine_inverse(img_a, minv) * scale

        flip_draw = jax.random.uniform(k_flip, ()) < 0.5
        do_flip = (not cfg.strict_quirks) and cfg.using_flip
        if do_flip:
            img_a = jnp.where(flip_draw, img_a[:, ::-1], img_a)
        # QUIRK(parity): with strict quirks, a drawn flip raises NameError in
        # the reference (datasets.py:267 uses joint_uvd_centered before its
        # definition at :277) and the bare except sends THAT sample down the
        # clean path — the other ~50% (coin says no flip) stay augmented.
        flip_fails = cfg.strict_quirks and cfg.using_flip

        com_af = jnp.stack(
            [com_a_int[0].astype(jnp.float32), com_a_int[1].astype(jnp.float32), com_z]
        )
        uvd_a = joints_uvd - com_af[None, :]
        uv = uvd_a[:, :2] / (box_f - 1.0) * (ims - 1.0)
        if do_flip:
            uv = jnp.where(flip_draw, uv * jnp.asarray([-1.0, 1.0]), uv)
        t = angle * (jnp.pi / 180.0)
        cos_t, sin_t = jnp.cos(t), jnp.sin(t)
        # uvd[:, :2] = uvd[:, :2] @ Rot.T with Rot = [[c, s], [-s, c]]
        # (utils.py:77-80), then * scale.
        u2 = (uv[:, 0] * cos_t + uv[:, 1] * sin_t) * scale
        v2 = (-uv[:, 0] * sin_t + uv[:, 1] * cos_t) * scale
        d2 = uvd_a[:, 2] * scale
        uvd_centered_a_resized = jnp.stack([u2, v2, d2], axis=1)

        # label synthesis from already-resized uv (so bypass the uv rescale
        # inside _labels_from_crop by inverting it):
        uv_unresized = uvd_centered_a_resized[:, :2] / (ims - 1.0) * (box_f - 1.0)
        uvd_for_labels = jnp.concatenate([uv_unresized, uvd_centered_a_resized[:, 2:3]], axis=1)
        label_a, mask_a, hm_a, dm_a, uvd_an, valid_a = _labels_from_crop(
            img_a, uvd_for_labels, box_f, cube_f, cfg
        )

        # crop validity: reference center_crop yields an empty slice for
        # negative/out-of-frame int centers -> resize error -> clean fallback.
        crop_ok = (
            (com_a_int[1] >= 0)
            & (com_a_int[1] <= h)
            & (com_a_int[0] >= 0)
            & (com_a_int[0] <= w)
        )
        # NOTE: the reference's augmented try block only fails at the heatmap
        # splat (mask/NaN checks at datasets.py:385-390 are outside the
        # try/except and would reject the sample entirely); we fold the
        # mask>=10 check into train-time validity for both paths.
        aug_ok = jnp.all(valid_a) & crop_ok
        if flip_fails:
            aug_ok = aug_ok & ~flip_draw

        out_a = {
            "img": img_a,
            "label_img": label_a,
            "mask": mask_a,
            "heatmaps": hm_a,
            "dmaps": dm_a,
            "uvd": uvd_an,
            "com": com_af,
            "valid": aug_ok,
        }

        if drop_fallback:
            # failed augmentations are simply masked from the loss
            out = out_a
        else:
            # reference semantics: fall back to the clean sample, which is
            # then valid whenever the clean path is
            out_a["valid"] = aug_ok | valid_c

            def _select(a, c):
                cond = jnp.reshape(aug_ok, (1,) * a.ndim) if a.ndim else aug_ok
                return jnp.where(cond, a, c)

            out = jax.tree_util.tree_map(_select, out_a, out_c)
    else:
        out = out_c

    return {
        "img": (out["img"] / cube_f)[:, :, None],
        "label_img": (out["label_img"] / cube_f)[:, :, None],
        "mask": out["mask"][:, :, None],
        "box_size": box_f,
        "cube": cube_f,
        "com": out["com"],
        "uvd": out["uvd"],
        "heatmaps": jnp.transpose(out["heatmaps"], (1, 2, 0)),
        "dmaps": jnp.transpose(out["dmaps"], (1, 2, 0)) / cube_f,
        "valid": out["valid"],
    }


def preprocess_batch(
    batch: Dict[str, jax.Array],
    key: jax.Array,
    cfg: PreprocessConfig,
    test_only: bool = False,
    augment: bool = False,
):
    """Vectorized preprocessing of a raw host batch.

    ``batch`` fields (leading batch dim B):
      frame ``[B, H, W]`` f32, joints ``[B, J, 3]`` f32 (absent if test_only),
      com ``[B, 3]`` f32, com_int ``[B, 2]`` i32, cube ``[B]`` f32,
      bbox ``[B, 4]`` i32 (left, top, right, bottom),
      crop_top/crop_left/box_size ``[B]`` i32.

    Returns NHWC training tensors (see `_process_one`). Heatmaps/dmaps are
    ``[B, label, label, J]``.
    """
    b = batch["frame"].shape[0]
    keys = jax.random.split(key, b)
    joints = batch.get("joints")
    if joints is None:
        joints = jnp.zeros((b, 1, 3), jnp.float32)

    def one(frame, joints_uvd, com, com_int, cube, bbox, top, left, box, k):
        return _process_one(
            frame, joints_uvd, com, com_int, cube, bbox, top, left, box, k,
            cfg, test_only, augment,
        )

    return jax.vmap(one)(
        batch["frame"],
        joints,
        batch["com"],
        batch["com_int"],
        batch["cube"],
        batch["bbox"],
        batch["crop_top"],
        batch["crop_left"],
        batch["box_size"],
        keys,
    )
