"""Native C++ frame-ops vs the numpy reference paths."""

import os
import struct

import numpy as np
import pytest

from pixelwiseregression_tpu import native
from pixelwiseregression_tpu.data.sources import (
    MSRASource,
    center_of_mass_fallback,
    load_bin,
)

if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)

RNG = np.random.RandomState(9)


def _write_bin(path, tile, left, top):
    h, w = tile.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<6i", 320, 240, left, top, left + w, top + h))
        f.write(tile.astype("<f4").tobytes())


def test_msra_decode_batch_matches_numpy(tmp_path):
    paths = []
    for i in range(5):
        tile = (RNG.rand(50 + i, 40 + i) * 500).astype(np.float32)
        tile[RNG.rand(*tile.shape) < 0.5] = 0
        p = str(tmp_path / f"{i:06d}_depth.bin")
        _write_bin(p, tile, left=100 + i, top=60 + i)
        paths.append(p)

    frames, coms, status = native.msra_decode_batch(paths, 240, 320)
    assert (status == 0).all()
    for i, p in enumerate(paths):
        tile, left, top, right, bottom = load_bin(p)
        want = np.zeros((240, 320))
        want[top:bottom, left:right] = tile
        np.testing.assert_allclose(frames[i], want, rtol=1e-6)
        np.testing.assert_allclose(coms[i], center_of_mass_fallback(want), rtol=1e-9)


def test_msra_decode_bad_file(tmp_path):
    p = str(tmp_path / "broken.bin")
    with open(p, "wb") as f:
        f.write(b"\x01\x02")
    frames, coms, status = native.msra_decode_batch([p], 240, 320)
    assert status[0] != 0
    assert (frames[0] == 0).all()


def test_nyu_pack_matches_numpy():
    rgb = RNG.randint(0, 256, (3, 48, 64, 3), dtype=np.uint8)
    got = native.nyu_pack_batch(rgb)
    g = rgb[:, :, :, 1].astype(np.float32) / 255.0
    b = rgb[:, :, :, 2].astype(np.float32) / 255.0
    want = (g * 256.0 + b) * 255.0
    np.testing.assert_array_equal(got, want)


def test_png16_scale_matches_numpy():
    raw = RNG.randint(0, 65536, (2, 32, 32), dtype=np.uint16)
    got = native.png16_scale_batch(raw)
    want = (raw.astype(np.float32) / 65535.0) * 65535.0
    np.testing.assert_array_equal(got, want)


def test_source_batch_records_uses_native(tmp_path):
    # minimal MSRA tree: 9 subjects x 1 frame
    for p in range(9):
        gdir = os.path.join(str(tmp_path), f"P{p}", "1")
        os.makedirs(gdir, exist_ok=True)
        joints = RNG.rand(1, 63) * 30
        with open(os.path.join(gdir, "joint.txt"), "w") as f:
            f.write("1\n" + " ".join(map(str, joints[0])) + "\n")
        tile = (RNG.rand(60, 60) * 300 + 100).astype(np.float32)
        _write_bin(os.path.join(gdir, "000000_depth.bin"), tile, 120, 80)

    src = MSRASource(str(tmp_path), dataset="test", subject=0, test_only=True)
    recs_native = src.batch_records(src.lines)
    recs_numpy = [src.record(l) for l in src.lines]
    for a, b in zip(recs_native, recs_numpy):
        np.testing.assert_allclose(a["frame"], b["frame"], rtol=1e-6)
        np.testing.assert_allclose(a["com"], b["com"], rtol=1e-6)
        assert a["box_size"] == b["box_size"]


def test_native_png_decode_matches_pil(tmp_path, monkeypatch):
    monkeypatch.setenv("PWR_NATIVE_PNG", "1")  # loader uses the full native decode
    """Full native PNG decode (zlib inflate + unfilter) must be bit-identical
    to the PIL path for both dataset formats — across all PNG row filters
    (PIL's encoder picks adaptively on textured content)."""
    from PIL import Image

    from pixelwiseregression_tpu import native

    if not native.available():
        pytest.skip("no native toolchain")

    rng = np.random.RandomState(0)
    h, w = 120, 160

    # NYU-style RGB with depth packed in (G,B) + smooth regions (exercises
    # Sub/Up/Average/Paeth filters)
    depth = (rng.rand(h, w) * 2000).astype(np.uint16)
    depth[20:60, 30:90] = 700  # constant block -> filter variety
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, :, 1] = (depth // 256).astype(np.uint8)
    rgb[:, :, 2] = (depth % 256).astype(np.uint8)
    p_rgb = str(tmp_path / "nyu.png")
    Image.fromarray(rgb).save(p_rgb)

    from pixelwiseregression_tpu.data.sources import load_png16, load_png_nyu

    ref = load_png_nyu(p_rgb)                 # PIL + native pack
    out = load_png_nyu(p_rgb, shape=(h, w))   # full native
    np.testing.assert_array_equal(out, ref)

    # 16-bit grayscale (ICVL/HAND17 style)
    g16 = (rng.rand(h, w) * 65535).astype(np.uint16)
    g16[10:50, 10:50] = 400
    p_g16 = str(tmp_path / "g16.png")
    Image.fromarray(g16).save(p_g16)
    ref = load_png16(p_g16)
    out = load_png16(p_g16, shape=(h, w))
    np.testing.assert_array_equal(out, ref)

    # wrong expected shape / corrupt file -> clean PIL fallback, not garbage
    out_fb = load_png16(p_g16, shape=(h + 2, w))
    np.testing.assert_array_equal(out_fb, ref)
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really a png")
    dec, status = native.png_decode_depth_batch([bad], native.PNG_MODE_GRAY16, h, w)
    assert status[0] != 0
