"""Synthetic MSRA dataset fixture: 9 subjects x 1 gesture x 4 frames of
blob 'hands' with joints placed inside the crop cube."""
import os
import struct
import sys

import numpy as np

root = sys.argv[1]
FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 4
rng = np.random.RandomState(0)


def write_bin(path, tile, left, top):
    h, w = tile.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<6i", 320, 240, left, top, left + w, top + h))
        f.write(tile.astype("<f4").tobytes())


def blob(h=80, w=80, depth=400.0):
    yy, xx = np.mgrid[0:h, 0:w]
    r2 = ((xx - w / 2) / (w / 2.2)) ** 2 + ((yy - h / 2) / (h / 2.2)) ** 2
    t = np.zeros((h, w), np.float32)
    t[r2 < 1] = depth + 40 * (r2[r2 < 1] - 0.5)
    return t


FX = 241.42
for p in range(9):
    gdir = os.path.join(root, f"P{p}", "1")
    os.makedirs(gdir, exist_ok=True)
    n = FRAMES
    rows = []
    # DETERMINISTIC joint geometry (fixed offsets from the blob center):
    # random per-frame joint placement would be unlearnable from the
    # featureless blob and put a ~40 mm Bayes floor under val mean-mm —
    # with fixed offsets the net can converge to a few mm (the convergence-
    # validation runs in PERF.md rely on this).
    ang = np.linspace(0, 2 * np.pi, 21, endpoint=False)
    off_u = np.concatenate([[0.0], 12 * np.cos(ang[1:11]), 24 * np.cos(ang[11:])])
    off_v = np.concatenate([[0.0], 12 * np.sin(ang[1:11]), 24 * np.sin(ang[11:])])
    off_d = 15.0 * np.sin(2 * ang)
    for i in range(n):
        z = 400.0 + rng.uniform(-10, 10)
        # uvd targets at fixed offsets, then invert xyz2uvd (+ sign flips)
        u = 160 + off_u
        v = 120 + off_v
        d = z + off_d
        x = (u - 160) / FX * d
        y_flipped = (v - 120) / FX * d        # y after the loader's sign flip
        joint_file_xyz = np.stack([x, -y_flipped, -d], 1)  # loader re-flips y,z
        rows.append(" ".join(f"{val:.6f}" for val in joint_file_xyz.reshape(-1)))
        write_bin(os.path.join(gdir, f"{i:06d}_depth.bin"), blob(depth=z), 120, 80)
    with open(os.path.join(gdir, "joint.txt"), "w") as f:
        f.write(f"{n}\n" + "\n".join(rows) + "\n")
print("fixture at", root)
