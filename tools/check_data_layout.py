"""Validate a real-dataset directory layout BEFORE a training/grading run.

No real datasets ship with this environment, so the first contact with real
MSRA/ICVL/NYU/HAND17 data must not be a crash mid-run: this tool checks the
directory layout against exactly what `data/sources.py` will read (reference
layouts: datasets.py:439-504, 550-624, 717-795, 881-926) and decodes one
sample per split end-to-end.

Usage:
    python tools/check_data_layout.py --dataset NYU --data_path /data/nyu

Exit 0 = layout valid (prints per-split sample counts); exit 1 = a numbered
list of everything missing/malformed.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _exists(problems, path, what):
    if not os.path.exists(path):
        problems.append(f"missing {what}: {path}")
        return False
    return True


def check_msra(root, problems):
    persons = [f"P{i}" for i in range(9)]
    for p in persons:
        if not _exists(problems, os.path.join(root, p), f"subject dir ({p})"):
            continue
        gestures = sorted(os.listdir(os.path.join(root, p)))
        if not gestures:
            problems.append(f"no gesture dirs under {root}/{p}")
            continue
        g = os.path.join(root, p, gestures[0])
        if _exists(problems, os.path.join(g, "joint.txt"), "joint.txt"):
            n = int(open(os.path.join(g, "joint.txt")).readline())
            j = np.loadtxt(os.path.join(g, "joint.txt"), skiprows=1)
            if j.shape != (n, 63):
                problems.append(
                    f"{g}/joint.txt: expected ({n}, 63) xyz rows, got {j.shape}")
            b = os.path.join(g, "000000_depth.bin")
            if _exists(problems, b, "first .bin tile"):
                hdr = np.fromfile(b, np.int32, 6)
                w, h, l, t, r, bm = hdr
                if (w, h) != (320, 240) or not (0 <= l < r <= w and 0 <= t < bm <= h):
                    problems.append(f"{b}: bad header {hdr.tolist()}")


def check_icvl(root, problems):
    for f in ("icvl_center_train.txt", "icvl_center_test.txt", "icvl_train_list.txt"):
        _exists(problems, os.path.join(root, f), "center/list file")
    _exists(problems, os.path.join(root, "Training", "labels.txt"), "Training/labels.txt")
    _exists(problems, os.path.join(root, "Training", "Depth"), "Training/Depth dir")
    for seq in (1, 2):
        _exists(problems, os.path.join(root, "Testing", f"test_seq_{seq}.txt"),
                f"Testing/test_seq_{seq}.txt")
    _exists(problems, os.path.join(root, "Testing", "Depth"), "Testing/Depth dir")


def check_nyu(root, problems):
    for f in ("nyu_center_train.txt", "nyu_center_test.txt"):
        _exists(problems, os.path.join(root, f), "center file")
    for split in ("train", "test"):
        if _exists(problems, os.path.join(root, split, "joint_data.mat"),
                   f"{split}/joint_data.mat"):
            from scipy.io import loadmat
            mat = loadmat(os.path.join(root, split, "joint_data.mat"))
            if "joint_uvd" not in mat:
                problems.append(f"{split}/joint_data.mat has no joint_uvd")
            elif mat["joint_uvd"].shape[2:] != (36, 3):
                problems.append(
                    f"{split}/joint_data.mat joint_uvd shape {mat['joint_uvd'].shape}"
                    " (want [K, N, 36, 3])")
        _exists(problems, os.path.join(root, split, "depth_1_0000001.png"),
                f"first {split} frame (depth_1_0000001.png)")


def check_hand17(root, problems):
    for f in ("hands17_center_train.txt", "hands17_center_test.txt"):
        _exists(problems, os.path.join(root, f), "center file")
    _exists(problems, os.path.join(root, "Training_Annotation.txt"),
            "Training_Annotation.txt")
    _exists(problems, os.path.join(root, "frame", "BoundingBox.txt"),
            "frame/BoundingBox.txt")
    # sources.py reads training frames from training/images (HAND17Source
    # load_raw) and test frames from frame/images
    _exists(problems, os.path.join(root, "training", "images"), "training/images dir")
    _exists(problems, os.path.join(root, "frame", "images"), "test frame images dir")


CHECKS = {"MSRA": check_msra, "ICVL": check_icvl, "NYU": check_nyu,
          "HAND17": check_hand17}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, choices=sorted(CHECKS))
    p.add_argument("--data_path", required=True)
    p.add_argument("--decode_sample", action="store_true", default=True,
                   help="also build the index and decode one sample per split")
    p.add_argument("--no_decode_sample", dest="decode_sample", action="store_false")
    args = p.parse_args(argv)

    problems = []
    if not os.path.isdir(args.data_path):
        problems.append(f"data_path is not a directory: {args.data_path}")
    else:
        CHECKS[args.dataset](args.data_path, problems)

    if not problems and args.decode_sample:
        try:
            from pixelwiseregression_tpu.data.sources import get_source

            kw = {"subject": 0} if args.dataset == "MSRA" else {}
            splits = ("train", "test")
            for split in splits:
                src = get_source(args.dataset, path=args.data_path,
                                 dataset=split, test_only=(split == "test"), **kw)
                rec = src.record(src.lines[0])
                frame = rec["frame"]
                print(f"{split}: {len(src)} samples; first frame "
                      f"{frame.shape} depth range [{frame[frame > 0].min():.0f}, "
                      f"{frame.max():.0f}] mm; com {np.round(rec['com'], 1)}")
        except Exception as e:  # noqa: BLE001 — report, don't crash
            problems.append(f"decoding a sample failed: {type(e).__name__}: {e}")

    if problems:
        print(f"LAYOUT INVALID for {args.dataset} at {args.data_path}:")
        for i, pr in enumerate(problems, 1):
            print(f"  {i}. {pr}")
        return 1
    print(f"LAYOUT OK for {args.dataset} at {args.data_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
