"""End-to-end CLI round trip on the synthetic MSRA fixture: build ->
train 1 epoch -> inference -> result file. Runs the same code paths as the
train_msra.py / test_msra.py entry points (tiny model, CPU)."""

import argparse
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def msra_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("msra"))
    script = os.path.join(os.path.dirname(__file__), "fixtures", "make_msra_fixture.py")
    subprocess.run([sys.executable, script, root], check=True, capture_output=True)
    return root


def _train_args(root):
    return argparse.Namespace(
        suffix="e2e", seed=1, batch_size=8, label_size=32, kernel_size=7,
        sigmoid=1.5, norm_method="instance", heatmap_method="softmax",
        stages=1, features=16, level=2, filter_size=3,
        using_rotation=True, using_scale=True, using_shift=True, using_flip=False,
        gpu_id="0", epoch=1, num_workers=2, opt="adam", lr=1e-3,
        beta1=0.9, beta2=0.999, weight_decay=0.0, mixed_precision=False,
        lambda_h=1.0, lambda_d=0.01, alpha=0.5, lr_decay=0.2, decay_epoch=15,
        decoder="xla", data_path=root, no_strict_quirks=False, bf16=False,
        matmul_precision=None, profile=None, resume=None, small=False,
    )


def _test_args(root):
    return argparse.Namespace(
        suffix="e2e", batch_size=8, label_size=32, kernel_size=7, sigmoid=1.5,
        norm_method="instance", heatmap_method="softmax", stages=1,
        features=16, level=2, filter_size=3, gpu_id="0", num_workers=2,
        seed="final", decoder="xla", data_path=root, no_strict_quirks=False,
        bf16=False, matmul_precision=None, profile=None, resume=None,
    )


def test_train_then_test_roundtrip(msra_fixture, tmp_path, monkeypatch):
    """Exercises the CLI DEFAULT norm (instance_anchored): training
    calibrates the anchors continuously (batch_stats in the checkpoint),
    and inference serves through the anchored fast path."""
    from pixelwiseregression_tpu.cli.test_main import run_inference
    from pixelwiseregression_tpu.cli.train_main import run_training
    from pixelwiseregression_tpu.train.checkpoint import load_checkpoint

    monkeypatch.chdir(tmp_path)  # Model/, Result/, logs/ land here
    args = _train_args(msra_fixture)
    args.norm_method = "instance_anchored"
    best_epoch, best_err = run_training(args, "MSRA", subject=0)
    assert np.isfinite(best_err) and best_err > 0
    assert os.path.exists("Model/MSRA_e2e_subject0_final.ckpt")
    ckpt = load_checkpoint("Model/MSRA_e2e_subject0_final.ckpt")
    anchors = [np.asarray(a) for a in
               __import__("jax").tree.leaves(ckpt["batch_stats"])]
    assert anchors and any(np.abs(a).max() > 0 for a in anchors), \
        "training should have calibrated the norm anchors"

    targs = _test_args(msra_fixture)
    targs.norm_method = "instance_anchored"
    result_name, fps = run_inference(targs, "MSRA", subject=0)
    assert os.path.exists(result_name)
    out = np.loadtxt(result_name)
    assert out.shape == (4, 21 * 3)
    assert np.isfinite(out).all()
    # de-normalized uvd should land near the fixture's hand (u~160 v~120 d~400)
    uvd = out.reshape(4, 21, 3)
    assert 100 < np.median(uvd[:, :, 0]) < 220
    assert 60 < np.median(uvd[:, :, 1]) < 180
    assert 300 < np.median(uvd[:, :, 2]) < 500


@pytest.fixture(scope="module")
def icvl_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("icvl"))
    script = os.path.join(os.path.dirname(__file__), "fixtures", "make_icvl_fixture.py")
    subprocess.run([sys.executable, script, root], check=True, capture_output=True)
    return root


def test_icvl_generic_train_test_roundtrip(icvl_fixture, tmp_path, monkeypatch):
    """Generic (non-MSRA) path: train.py/test.py equivalents on ICVL."""
    from pixelwiseregression_tpu.cli.test_main import run_inference
    from pixelwiseregression_tpu.cli.train_main import run_training

    monkeypatch.chdir(tmp_path)
    args = _train_args(icvl_fixture)
    best_epoch, best_err = run_training(args, "ICVL")
    assert np.isfinite(best_err)
    assert os.path.exists("Model/ICVL_e2e_final.ckpt")

    targs = _test_args(icvl_fixture)
    targs.process_mode = "uvd"
    result_name, fps = run_inference(targs, "ICVL")
    out = np.loadtxt(result_name)
    assert out.shape == (6, 16 * 3)
    assert np.isfinite(out).all()


@pytest.fixture(scope="module")
def hand17_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hand17"))
    script = os.path.join(os.path.dirname(__file__), "fixtures", "make_hand17_fixture.py")
    subprocess.run([sys.executable, script, root], check=True, capture_output=True)
    return root


def test_hand17_train_and_bb_inference(hand17_fixture, tmp_path, monkeypatch):
    """HAND17: xyz->uvd training annotations, 95/5 split, and the 'bb'
    test-time process mode + challenge submission format."""
    from pixelwiseregression_tpu.cli.test_main import run_inference
    from pixelwiseregression_tpu.cli.train_main import run_training

    monkeypatch.chdir(tmp_path)
    args = _train_args(hand17_fixture)
    best_epoch, best_err = run_training(args, "HAND17")
    assert np.isfinite(best_err)
    # 95/5 split wrote both files
    assert os.path.exists(os.path.join(hand17_fixture, "train.txt"))
    assert os.path.exists(os.path.join(hand17_fixture, "val.txt"))

    for mode in ("uvd", "bb"):
        targs = _test_args(hand17_fixture)
        targs.process_mode = mode
        result_name, fps = run_inference(targs, "HAND17")
        with open(result_name) as f:
            lines = [l for l in f.read().splitlines() if l.strip()]
        assert len(lines) == 4
        # challenge submission format: frame\images\image_D%08d.png prefix
        assert lines[0].startswith("frame\\images\\image_D00000001.png\t")
        vals = np.array(lines[0].split("\t")[1:], float)
        assert vals.shape == (63,) and np.isfinite(vals).all()


@pytest.fixture(scope="module")
def nyu_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nyu"))
    script = os.path.join(os.path.dirname(__file__), "fixtures", "make_nyu_fixture.py")
    subprocess.run([sys.executable, script, root], check=True, capture_output=True)
    return root


def test_nyu_roundtrip_and_fullregression(nyu_fixture, tmp_path, monkeypatch):
    """NYU e2e (RGB-packed depth, mat annotations, val=checked test) and the
    FullRegression ablation training path (uvd-only loss)."""
    from pixelwiseregression_tpu.cli.test_main import run_inference
    from pixelwiseregression_tpu.cli.train_main import run_training

    monkeypatch.chdir(tmp_path)
    args = _train_args(nyu_fixture)
    best_epoch, best_err = run_training(args, "NYU")
    assert np.isfinite(best_err)

    targs = _test_args(nyu_fixture)
    targs.process_mode = "uvd"
    result_name, _ = run_inference(targs, "NYU")
    out = np.loadtxt(result_name)
    assert out.shape == (4, 14 * 3) and np.isfinite(out).all()

    # FullRegression ablation (train_fullregression.py path)
    fargs = _train_args(nyu_fixture)
    fargs.suffix = "fr"
    for a in ("heatmap_method", "lambda_h", "lambda_d", "alpha", "filter_size"):
        delattr(fargs, a) if hasattr(fargs, a) else None
    best_epoch, best_err = run_training(fargs, "NYU", fullregression=True)
    assert np.isfinite(best_err)
    tf = _test_args(nyu_fixture)
    tf.suffix = "fr"
    result_name, _ = run_inference(tf, "NYU", fullregression=True)
    out = np.loadtxt(result_name)
    assert out.shape == (4, 14 * 3) and np.isfinite(out).all()
