"""Dataset-source tests on tiny synthetic fixtures (real datasets are not
shipped; these verify decode + index-building logic per dataset)."""

import os
import struct

import numpy as np
import pytest

pytestmark = pytest.mark.quick
from PIL import Image

from pixelwiseregression_tpu.data.sources import (
    HAND17Source,
    ICVLSource,
    MSRASource,
    NYUSource,
    center_of_mass_fallback,
    decode_line,
    load_bin,
    load_png16,
    load_png_nyu,
    make_record,
)

RNG = np.random.RandomState(5)


def _write_bin(path, tile, left, top):
    h, w = tile.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<6i", 320, 240, left, top, left + w, top + h))
        f.write(tile.astype("<f4").tobytes())


def _blob_tile(h=60, w=60, depth=400.0):
    yy, xx = np.mgrid[0:h, 0:w]
    r2 = ((xx - w / 2) / (w / 2.5)) ** 2 + ((yy - h / 2) / (h / 2.5)) ** 2
    tile = np.zeros((h, w), np.float32)
    tile[r2 < 1] = depth + 30 * (r2[r2 < 1] - 0.5)
    return tile


def test_load_bin_roundtrip(tmp_path):
    tile = _blob_tile()
    p = str(tmp_path / "000000_depth.bin")
    _write_bin(p, tile, left=100, top=80)
    img, left, top, right, bottom = load_bin(p)
    assert (left, top, right, bottom) == (100, 80, 160, 140)
    np.testing.assert_allclose(img, tile, rtol=1e-6)


def test_png16_roundtrip(tmp_path):
    depth = (RNG.rand(240, 320) * 2000).astype(np.uint16)
    p = str(tmp_path / "d.png")
    Image.fromarray(depth, mode="I;16").save(p)
    got = load_png16(p)
    # replicates plt.imread*65535 float32 rounding: within 0.005 of the raw
    np.testing.assert_allclose(got, depth.astype(np.float64), atol=5e-3)


def test_png_nyu_roundtrip(tmp_path):
    depth = (RNG.rand(480, 640) * 30000).astype(np.uint16)
    rgb = np.zeros((480, 640, 3), np.uint8)
    rgb[:, :, 1] = (depth // 256).astype(np.uint8)
    rgb[:, :, 2] = (depth % 256).astype(np.uint8)
    p = str(tmp_path / "depth_1_0000001.png")
    Image.fromarray(rgb).save(p)
    got = load_png_nyu(p)
    np.testing.assert_allclose(got, depth.astype(np.float64), atol=2e-2)


def test_center_of_mass_fallback_matches_scipy():
    from scipy.ndimage import center_of_mass

    frame = np.zeros((240, 320))
    tile = _blob_tile()
    frame[90:150, 120:180] = tile
    com = center_of_mass_fallback(frame)
    want_rc = center_of_mass(frame > 0)
    np.testing.assert_allclose(com[0], want_rc[1], rtol=1e-9)
    np.testing.assert_allclose(com[1], want_rc[0], rtol=1e-9)
    np.testing.assert_allclose(com[2], frame[frame > 0].mean(), rtol=1e-12)


def _make_msra_tree(root):
    """P0..P8, one gesture, 2 frames each."""
    for p in range(9):
        gdir = os.path.join(root, f"P{p}", "1")
        os.makedirs(gdir, exist_ok=True)
        n = 2
        joints = RNG.rand(n, 21, 3) * 40
        joints[:, :, 2] += 380  # z before sign flip
        with open(os.path.join(gdir, "joint.txt"), "w") as f:
            f.write(f"{n}\n")
            for i in range(n):
                f.write(" ".join(f"{v:.6f}" for v in joints[i].reshape(-1)) + "\n")
        for i in range(n):
            _write_bin(os.path.join(gdir, f"{i:06d}_depth.bin"), _blob_tile(), 130, 90)


def test_msra_build_and_record(tmp_path):
    root = str(tmp_path)
    _make_msra_tree(root)
    src = MSRASource(root, dataset="test", subject=0, test_only=True)
    assert src.data_ready
    assert len(src.lines) == 2
    # LOSO: train_0 excludes subject 0 (8 subjects x 2), val_0 == subject 0
    with open(os.path.join(root, "train_0.txt")) as f:
        assert len([l for l in f.read().splitlines() if l.strip()]) == 16
    with open(os.path.join(root, "val_0.txt")) as f:
        assert len([l for l in f.read().splitlines() if l.strip()]) == 2

    rec = src.record(src.lines[0])
    assert rec["frame"].shape == (240, 320)
    assert rec["joints"].shape == (21, 3)
    assert rec["box_size"] > 0 and rec["box_size"] % 2 == 0
    # y,z sign flip applied before xyz->uvd: line stores flipped xyz
    _, joints_xyz = decode_line(src.lines[0])
    assert np.all(joints_xyz[:, 2] < 0)  # z flipped negative

    # com fallback must match the frame's center of mass
    frame, _, com, cube, bbox = src.load_raw(src.lines[0])
    np.testing.assert_allclose(com, center_of_mass_fallback(frame))


def test_make_record_crop_ints():
    frame = np.zeros((240, 320), np.float64)
    com = np.array([160.7, 120.3, 400.0])
    from pixelwiseregression_tpu.data.sources import MSRA_SPEC

    rec = make_record(MSRA_SPEC, frame, None, com, 125.0)
    du = 125.0 / 400.0 * 241.42
    box = int(du + du)
    s = box // 2
    assert rec["box_size"] == 2 * s
    assert rec["crop_top"] == 120 - s
    assert rec["crop_left"] == 160 - s
    assert tuple(rec["com_int"]) == (160, 120)


def _write_png16(path, depth_u16):
    Image.fromarray(depth_u16.astype(np.uint16), mode="I;16").save(path)


def test_icvl_build_and_load(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "Testing", "Depth", "test_seq_1"), exist_ok=True)
    os.makedirs(os.path.join(root, "Training", "Depth", "a"), exist_ok=True)

    frame = np.zeros((240, 320), np.uint16)
    frame[90:150, 130:190] = (_blob_tile() + 0.5).astype(np.uint16)
    _write_png16(os.path.join(root, "Testing", "Depth", "test_seq_1", "image_0000.png"), frame)
    _write_png16(os.path.join(root, "Training", "Depth", "a", "img1.png"), frame)

    joints = RNG.rand(16, 3) * 30 + np.array([150, 110, 380])
    row = " ".join(str(v) for v in joints.reshape(-1))
    with open(os.path.join(root, "Testing", "test_seq_1.txt"), "w") as f:
        f.write("test_seq_1/image_0000.png " + row + "\n")
    with open(os.path.join(root, "Testing", "test_seq_2.txt"), "w") as f:
        f.write("\n")
    with open(os.path.join(root, "Training", "labels.txt"), "w") as f:
        f.write("a/img1.png " + row + "\n")
        f.write("aug/a/img1.png " + row + "\n")  # pre-augmented: must be skipped
    with open(os.path.join(root, "icvl_train_list.txt"), "w") as f:
        f.write("a/img1.png\n")
    np.savetxt(os.path.join(root, "icvl_center_train.txt"), np.array([[160.0, 120.0, 400.0]]))
    np.savetxt(os.path.join(root, "icvl_center_test.txt"), np.array([[160.0, 120.0, 400.0]]))

    src = ICVLSource(root, dataset="test", test_only=True)
    assert len(src.lines) == 1
    with open(os.path.join(root, "train.txt")) as f:
        train_lines = [l for l in f.read().splitlines() if l.strip()]
    assert len(train_lines) == 1  # augmented row dropped

    frame_out, joint_uvd, com, cube, bbox = src.load_raw(src.lines[0])
    assert frame_out.shape == (240, 320)
    np.testing.assert_allclose(com, [160.0, 120.0, 400.0])
    assert bbox[0] >= 0 and bbox[2] <= 320
    np.testing.assert_allclose(joint_uvd, joints, rtol=1e-6)


def test_nyu_build_and_load(tmp_path):
    from scipy.io import savemat
    from pixelwiseregression_tpu.data.sources import NYU_JOINT_INDEX

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "test"), exist_ok=True)

    n_train, n_test = 3, 2
    uvd_train = RNG.rand(3, n_train, 36, 3) * 50 + np.array([300, 220, 700])
    uvd_test = RNG.rand(1, n_test, 36, 3) * 50 + np.array([300, 220, 700])
    savemat(os.path.join(root, "train", "joint_data.mat"), {"joint_uvd": uvd_train})
    savemat(os.path.join(root, "test", "joint_data.mat"), {"joint_uvd": uvd_test})

    depth = np.zeros((480, 640), np.uint16)
    depth[180:280, 260:360] = (RNG.rand(100, 100) * 100 + 650).astype(np.uint16)
    rgb = np.zeros((480, 640, 3), np.uint8)
    rgb[:, :, 1] = (depth // 256).astype(np.uint8)
    rgb[:, :, 2] = (depth % 256).astype(np.uint8)
    for split, n in (("train", n_train), ("test", n_test)):
        for i in range(n):
            Image.fromarray(rgb).save(os.path.join(root, split, f"depth_1_{i+1:07d}.png"))

    centers = np.tile([310.0, 230.0, 700.0], (max(n_train, n_test) + 2500, 1))
    np.savetxt(os.path.join(root, "nyu_center_train.txt"), centers)
    np.savetxt(os.path.join(root, "nyu_center_test.txt"), centers)

    src = NYUSource(root, dataset="test", test_only=True)
    assert len(src.lines) == n_test
    with open(os.path.join(root, "train.txt")) as f:
        assert len([l for l in f.read().splitlines() if l.strip()]) == n_train
    # val = checked test set (reference: datasets.py:759-793)
    with open(os.path.join(root, "val.txt")) as f:
        assert len([l for l in f.read().splitlines() if l.strip()]) == n_test

    frame, joint_uvd, com, cube, bbox = src.load_raw(src.lines[0])
    assert frame.shape == (480, 640)
    assert joint_uvd.shape == (14, 3)
    np.testing.assert_allclose(joint_uvd, uvd_test[0, 0][NYU_JOINT_INDEX], rtol=1e-6)
    assert cube == 150.0  # index 0 <= 2440: no shrink


def test_nyu_cube_shrink_past_2440(tmp_path):
    """test index > 2440 shrinks the cube to int(150*5/6)=125
    (reference: datasets.py:818-819)."""
    root = str(tmp_path)
    centers = np.tile([310.0, 230.0, 700.0], (3000, 1))
    np.savetxt(os.path.join(root, "nyu_center_train.txt"), centers)
    np.savetxt(os.path.join(root, "nyu_center_test.txt"), centers)
    os.makedirs(os.path.join(root, "test"), exist_ok=True)

    depth = np.full((480, 640), 700, np.uint16)
    rgb = np.zeros((480, 640, 3), np.uint8)
    rgb[:, :, 1] = (depth // 256).astype(np.uint8)
    rgb[:, :, 2] = (depth % 256).astype(np.uint8)
    Image.fromarray(rgb).save(os.path.join(root, "test", "depth_1_0002500.png"))

    src = NYUSource.__new__(NYUSource)
    src.spec = src.SPEC = NYUSource.SPEC
    src.path = root
    src.dataset = "test"
    src.cube_size = 150.0
    src.camera = NYUSource.SPEC.camera
    src.test_centers = centers
    src.train_centers = centers
    joints = " ".join(["1.0"] * 42)
    line = os.path.join(root, "test", "depth_1_0002500.png") + " " + joints
    frame, joint_uvd, com, cube, bbox = src.load_raw(line)
    assert cube == 125


def test_hand17_bb_mode(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "frame", "images"), exist_ok=True)

    depth = np.zeros((480, 640), np.uint16)
    depth[200:280, 280:360] = 600        # hand
    depth[205:215, 285:295] = 900        # background clutter inside bbox
    _write_png16(os.path.join(root, "frame", "images", "image_D00000001.png"), depth)

    src = HAND17Source.__new__(HAND17Source)
    src.spec = src.SPEC = HAND17Source.SPEC
    src.path = root
    src.dataset = "test"
    src.process_mode = "bb"
    src.cube_size = 150.0
    src.camera = HAND17Source.SPEC.camera

    line = "image_D00000001.png 270 190 110 110"
    frame, joints, com, cube, bbox = src._load_raw_bb(line)
    # iterative mean-depth removal kills the 900mm clutter
    assert frame.max() <= 600
    assert (frame[200:280, 280:360] > 0).sum() > 1000
    assert joints is None
    assert 280 <= com[0] <= 360 and 200 <= com[1] <= 280
