"""Synthetic ICVL dataset fixture: blob hands in 16-bit PNGs with center
files, training labels, and two test sequences."""
import os
import sys

import numpy as np
from PIL import Image

root = sys.argv[1]
n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 24
n_test = int(sys.argv[3]) if len(sys.argv) > 3 else 6
rng = np.random.RandomState(0)

os.makedirs(os.path.join(root, "Testing", "Depth", "test_seq_1"), exist_ok=True)
os.makedirs(os.path.join(root, "Testing", "Depth", "test_seq_2"), exist_ok=True)
os.makedirs(os.path.join(root, "Training", "Depth", "seq"), exist_ok=True)


def blob_frame(cu, cv, z):
    frame = np.zeros((240, 320), np.float64)
    yy, xx = np.mgrid[0:240, 0:320]
    r2 = ((xx - cu) / 35.0) ** 2 + ((yy - cv) / 35.0) ** 2
    frame[r2 < 1] = z + 30 * (r2[r2 < 1] - 0.5)
    return frame.astype(np.uint16)


def joints_row(cu, cv, z):
    j_u = rng.uniform(cu - 15, cu + 15, 16)
    j_v = rng.uniform(cv - 15, cv + 15, 16)
    j_d = rng.uniform(z - 25, z + 25, 16)
    return np.stack([j_u, j_v, j_d], 1).reshape(-1)


train_rows, names, centers = [], [], []
for i in range(n_train):
    cu, cv, z = rng.uniform(120, 200), rng.uniform(90, 150), rng.uniform(350, 450)
    name = f"seq/image_{i:04d}.png"
    Image.fromarray(blob_frame(cu, cv, z)).save(
        os.path.join(root, "Training", "Depth", name))
    train_rows.append(name + " " + " ".join(map(str, joints_row(cu, cv, z))))
    names.append(name)
    centers.append([cu, cv, z])

with open(os.path.join(root, "Training", "labels.txt"), "w") as f:
    f.write("\n".join(train_rows) + "\n")
with open(os.path.join(root, "icvl_train_list.txt"), "w") as f:
    f.write("\n".join(names) + "\n")
np.savetxt(os.path.join(root, "icvl_center_train.txt"), np.array(centers))

test_centers = []
rows = {1: [], 2: []}
for i in range(n_test):
    seq = 1 if i < (n_test + 1) // 2 else 2
    idx = i if seq == 1 else i - (n_test + 1) // 2
    cu, cv, z = rng.uniform(120, 200), rng.uniform(90, 150), rng.uniform(350, 450)
    name = f"test_seq_{seq}/image_{idx:04d}.png"
    Image.fromarray(blob_frame(cu, cv, z)).save(
        os.path.join(root, "Testing", "Depth", name))
    rows[seq].append(name + " " + " ".join(map(str, joints_row(cu, cv, z))))
    test_centers.append([cu, cv, z])

# reference lookup: test_seq_2 indexes offset by 702 (datasets.py:641-646)
full_centers = np.zeros((2000, 3))
k1 = (n_test + 1) // 2
for i in range(k1):
    full_centers[i] = test_centers[i]
for i in range(n_test - k1):
    full_centers[702 + i] = test_centers[k1 + i]
np.savetxt(os.path.join(root, "icvl_center_test.txt"), full_centers)

for seq in (1, 2):
    with open(os.path.join(root, "Testing", f"test_seq_{seq}.txt"), "w") as f:
        f.write("\n".join(rows[seq]) + "\n")
print("fixture at", root)
