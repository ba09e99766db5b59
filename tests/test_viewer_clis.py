"""Headless smoke tests for the three viewer/figure CLIs
(check_samples.py, test_samples.py, get_sfr.py — reference CLIs of the same
names). Each drives the real framework on a synthetic fixture with the Agg
backend and asserts an artifact materializes — catches argument-wiring
regressions without a display."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def msra_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("msra"))
    script = os.path.join(REPO, "tests", "fixtures", "make_msra_fixture.py")
    subprocess.run([sys.executable, script, root], check=True, capture_output=True)
    return root


@pytest.fixture(scope="module")
def nyu_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nyu"))
    script = os.path.join(REPO, "tests", "fixtures", "make_nyu_fixture.py")
    subprocess.run([sys.executable, script, root], check=True, capture_output=True)
    return root


def _env():
    env = dict(os.environ)
    env["MPLBACKEND"] = "Agg"
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _ckpt(model_kw, name, workdir, joints):
    """Write an initialized-model checkpoint under Model/<name>.ckpt."""
    import jax
    import jax.numpy as jnp

    from pixelwiseregression_tpu.models import PixelwiseRegression
    from pixelwiseregression_tpu.train.checkpoint import save_checkpoint

    model = PixelwiseRegression(joints=joints, **model_kw)
    s = model_kw["label_size"]
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2 * s, 2 * s, 1)),
        jnp.zeros((1, s, s, 1)), jnp.zeros((1, s, s, 1)), train=False,
    )
    os.makedirs(os.path.join(workdir, "Model"), exist_ok=True)
    save_checkpoint(os.path.join(workdir, "Model", f"{name}.ckpt"),
                    variables["params"])


def test_check_samples_smoke(msra_fixture, tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "check_samples.py"),
         "--dataset", "MSRA", "--set", "train", "--data_path", msra_fixture,
         "--max_samples", "2"],
        cwd=str(tmp_path), env=_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]


def test_test_samples_smoke(msra_fixture, tmp_path):
    kw = dict(stage=1, label_size=32, features=16, level=2,
              norm_method="instance", heatmap_method="softmax", decoder="xla")
    _ckpt(kw, "MSRA_smoke_subject0_final", str(tmp_path), joints=21)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "test_samples.py"),
         "--dataset", "MSRA", "--set", "train", "--suffix", "smoke",
         "--subject", "0", "--data_path", msra_fixture, "--label_size", "32",
         "--features", "16", "--level", "2", "--stages", "1",
         "--max_samples", "2", "--headless"],
        cwd=str(tmp_path), env=_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    saved = os.listdir(str(tmp_path / "Samples"))
    assert len(saved) == 2, saved


def test_get_sfr_smoke(nyu_fixture, tmp_path):
    kw = dict(stage=1, label_size=32, features=16, level=2,
              norm_method="instance", heatmap_method="softmax", decoder="xla")
    for sfx in ("detection", "regression"):
        _ckpt(kw, f"NYU_{sfx}_final", str(tmp_path), joints=14)
    out = str(tmp_path / "Result" / "sfr.png")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "get_sfr.py"),
         "--dataset", "NYU", "--suffixes", "detection", "regression",
         "--data_path", nyu_fixture, "--label_size", "32", "--features", "16",
         "--level", "2", "--stages", "1", "--num_samples", "2",
         "--joints_to_show", "0", "3", "--out", out],
        cwd=str(tmp_path), env=_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out) and os.path.getsize(out) > 1000
