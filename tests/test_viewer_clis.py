"""Headless smoke tests for the three viewer/figure CLIs
(check_samples.py, test_samples.py, get_sfr.py — reference CLIs of the
same names): argument wiring + end-to-end run on fixture data with the
Agg backend, asserting an artifact materializes. VERDICT round-2 weak
item 7."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def viewer_ctx(tmp_path_factory):
    """NYU fixture + a tiny trained checkpoint (Model/NYU_e2e_final.ckpt)
    in a shared working dir."""
    import argparse

    root = str(tmp_path_factory.mktemp("nyu"))
    script = os.path.join(os.path.dirname(__file__), "fixtures", "make_nyu_fixture.py")
    subprocess.run([sys.executable, script, root], check=True, capture_output=True)

    work = str(tmp_path_factory.mktemp("work"))
    args = argparse.Namespace(
        suffix="e2e", seed=1, batch_size=8, label_size=32, kernel_size=7,
        sigmoid=1.5, norm_method="instance", heatmap_method="softmax",
        stages=1, features=16, level=2, filter_size=3,
        using_rotation=False, using_scale=False, using_shift=False,
        using_flip=False, gpu_id="0", epoch=1, num_workers=2, opt="adam",
        lr=1e-3, beta1=0.9, beta2=0.999, weight_decay=0.0,
        mixed_precision=False, lambda_h=1.0, lambda_d=0.01, alpha=0.5,
        lr_decay=0.2, decay_epoch=15, decoder="xla", data_path=root,
        no_strict_quirks=False, bf16=False, matmul_precision=None,
        profile=None, resume=None, small=False,
    )
    from pixelwiseregression_tpu.cli.train_main import run_training

    prev = os.getcwd()
    os.chdir(work)
    try:
        run_training(args, "NYU")
        assert os.path.exists("Model/NYU_e2e_final.ckpt")
    finally:
        os.chdir(prev)
    return {"root": root, "work": work}


def _run(cli, argv, cwd):
    # PWR_PLATFORM (not just JAX_PLATFORMS): the tunnel plugin overrides
    # the env var, so without the config-level override these subprocesses
    # would initialize the TPU backend — and block forever when the tunnel
    # is down (cli/common.apply_platform_override)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PWR_PLATFORM="cpu",
               MPLBACKEND="Agg")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, cli), *argv],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"{cli} failed:\n{proc.stdout}\n{proc.stderr}"
    return proc


def test_check_samples_smoke(viewer_ctx):
    # Agg makes plt.show() a no-op; --max_samples bounds the loop
    _run("check_samples.py",
         ["--dataset", "NYU", "--set", "train",
          "--data_path", viewer_ctx["root"], "--max_samples", "2"],
         viewer_ctx["work"])


def test_test_samples_headless(viewer_ctx):
    out_dir = os.path.join(viewer_ctx["work"], "Samples")
    _run("test_samples.py",
         ["--dataset", "NYU", "--set", "test", "--suffix", "e2e",
          "--data_path", viewer_ctx["root"], "--label_size", "32",
          "--stages", "1", "--features", "16", "--level", "2",
          "--headless", "--max_samples", "1", "--save_dir", out_dir],
         viewer_ctx["work"])
    assert os.path.exists(os.path.join(out_dir, "sample_0.png"))


def test_get_sfr_figure(viewer_ctx):
    out = os.path.join(viewer_ctx["work"], "Result", "sfr_test.png")
    proc = _run("get_sfr.py",
                ["--dataset", "NYU", "--suffixes", "e2e", "missing",
                 "--data_path", viewer_ctx["root"], "--label_size", "32",
                 "--stages", "1", "--features", "16", "--level", "2",
                 "--num_samples", "2", "--joints_to_show", "0", "3",
                 "--out", out],
                viewer_ctx["work"])
    # the absent suffix is skipped with a message, not an error
    assert "skipping missing" in proc.stdout
    assert os.path.exists(out) and os.path.getsize(out) > 0
