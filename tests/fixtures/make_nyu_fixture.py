"""Synthetic NYU dataset fixture: RGB-packed 16-bit depth PNGs (G*256+B,
reference: datasets.py:809-810), joint_data.mat with 36-joint uvd
annotations, and nyu_center_{train,test}.txt center files.

Usage: python make_nyu_fixture.py <root> [n_train] [n_test]
"""
import os
import sys

import numpy as np
from PIL import Image
from scipy.io import savemat

root = sys.argv[1]
n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 24
n_test = int(sys.argv[3]) if len(sys.argv) > 3 else 4

rng = np.random.RandomState(0)
os.makedirs(os.path.join(root, "train"), exist_ok=True)
os.makedirs(os.path.join(root, "test"), exist_ok=True)


def write_split(split, n):
    uvds = np.zeros((1, n, 36, 3))
    centers = []
    for i in range(n):
        cu, cv, z = rng.uniform(250, 390), rng.uniform(180, 300), rng.uniform(650, 850)
        frame = np.zeros((480, 640), np.float64)
        yy, xx = np.mgrid[0:480, 0:640]
        r2 = ((xx - cu) / 55.0) ** 2 + ((yy - cv) / 55.0) ** 2
        # mid-frequency surface texture: a bare paraboloid blob produces
        # near-constant activation channels whose instance-norm statistics
        # are degenerate (var ~ eps) and chaotically amplify backend float
        # noise — unlike real hands. Bumps keep every channel conditioned.
        bumps = 6.0 * np.sin(xx / 3.1) * np.cos(yy / 4.3) + 4.0 * np.sin((xx + yy) / 7.7)
        inside = r2 < 1
        frame[inside] = z + 50 * (r2[inside] - 0.5) + bumps[inside]
        d16 = frame.astype(np.uint16)
        rgb = np.zeros((480, 640, 3), np.uint8)
        rgb[:, :, 1] = (d16 // 256).astype(np.uint8)
        rgb[:, :, 2] = (d16 % 256).astype(np.uint8)
        Image.fromarray(rgb).save(os.path.join(root, split, f"depth_1_{i+1:07d}.png"))
        # DETERMINISTIC joint geometry (fixed offsets from the blob
        # center): random per-frame joints would be unlearnable from the
        # featureless blob and floor val mean-mm at ~40 mm (PERF.md
        # convergence-validation note; make_msra_fixture.py has the same
        # pattern). Fixed offsets let flagship convergence runs reach a
        # few mm.
        ang = np.linspace(0, 2 * np.pi, 36, endpoint=False)
        radius = 12.0 + 28.0 * (np.arange(36) % 3) / 2.0  # rings at 12/26/40 px
        uvds[0, i, :, 0] = cu + radius * np.cos(ang)
        uvds[0, i, :, 1] = cv + radius * np.sin(ang)
        uvds[0, i, :, 2] = z + 25.0 * np.sin(2 * ang)
        centers.append([cu, cv, z])
    savemat(os.path.join(root, split, "joint_data.mat"), {"joint_uvd": uvds})
    return centers

np.savetxt(os.path.join(root, "nyu_center_train.txt"), np.array(write_split("train", n_train)))
np.savetxt(os.path.join(root, "nyu_center_test.txt"), np.array(write_split("test", n_test)))
