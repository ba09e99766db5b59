"""Synthetic HAND17 dataset fixture: 16-bit PNG frames, xyz training
annotations, center files, and a BoundingBox.txt test set."""
import os
import sys

import numpy as np
from PIL import Image

root = sys.argv[1]
n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 24
n_test = int(sys.argv[3]) if len(sys.argv) > 3 else 4
rng = np.random.RandomState(0)

FX, FY, HU, HV = 475.065948, 475.065857, 315.944855, 245.287079

os.makedirs(os.path.join(root, "training", "images"), exist_ok=True)
os.makedirs(os.path.join(root, "frame", "images"), exist_ok=True)


def blob_frame(cu, cv, z):
    frame = np.zeros((480, 640), np.float64)
    yy, xx = np.mgrid[0:480, 0:640]
    r2 = ((xx - cu) / 50.0) ** 2 + ((yy - cv) / 50.0) ** 2
    frame[r2 < 1] = z + 40 * (r2[r2 < 1] - 0.5)
    return frame.astype(np.uint16)


rows, centers = [], []
for i in range(n_train):
    cu, cv, z = rng.uniform(250, 390), rng.uniform(180, 300), rng.uniform(500, 700)
    name = f"image_D{i + 1:08d}.png"
    Image.fromarray(blob_frame(cu, cv, z)).save(os.path.join(root, "training", "images", name))
    # training annotations are xyz (datasets.py:937-938)
    u = rng.uniform(cu - 20, cu + 20, 21)
    v = rng.uniform(cv - 20, cv + 20, 21)
    d = rng.uniform(z - 40, z + 40, 21)
    x = (u - HU) / FX * d
    y = (v - HV) / FY * d
    xyz = np.stack([x, y, d], 1).reshape(-1)
    rows.append(name + "\t" + "\t".join(map(str, xyz)))
    centers.append([cu, cv, z])

with open(os.path.join(root, "training", "Training_Annotation.txt"), "w") as f:
    f.write("\n".join(rows) + "\n")
np.savetxt(os.path.join(root, "hands17_center_train.txt"), np.array(centers))

bb_rows, test_centers = [], []
for i in range(n_test):
    cu, cv, z = rng.uniform(250, 390), rng.uniform(180, 300), rng.uniform(500, 700)
    name = f"image_D{i + 1:08d}.png"
    Image.fromarray(blob_frame(cu, cv, z)).save(os.path.join(root, "frame", "images", name))
    bb_rows.append(f"{name}\t{cu - 60:.1f}\t{cv - 60:.1f}\t120\t120")
    test_centers.append([cu, cv, z])

with open(os.path.join(root, "frame", "BoundingBox.txt"), "w") as f:
    f.write("\n".join(bb_rows) + "\n")
np.savetxt(os.path.join(root, "hands17_center_test.txt"), np.array(test_centers))
print("fixture at", root)
