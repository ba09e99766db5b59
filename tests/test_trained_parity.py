"""Trained-weights checkpoint parity through the FULL pipeline.

Random-init parity (test_verify_parity.py) can hide conditioning-dependent
drift: untrained instance norm amplifies backend float noise. This test
briefly trains the reference torch `PixelwiseRegression` on real crops from
the synthetic NYU fixture (produced by THIS framework's loader+preprocess,
so both graphs later see identical inputs), saves a reference-format ``.pt``
({state_dict, seed, model_param} — reference: utils.py:302-307), and runs
the ≤0.1 mm per-joint parity gate (`compat.verify_parity`) on fixture test
crops — the converted-flax vs torch inference path of reference
test.py:93-115, on trained weights.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
if not os.path.isdir("/root/reference"):
    pytest.skip("reference repo not available", allow_module_level=True)

sys.path.insert(0, "/root/reference")

LABEL_SIZE = 16  # image 32x32: tiny but a real 2-stage graph


@pytest.fixture(scope="module")
def nyu_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nyu_parity"))
    script = os.path.join(os.path.dirname(__file__), "fixtures", "make_nyu_fixture.py")
    subprocess.run([sys.executable, script, root, "16", "6"],
                   check=True, capture_output=True)
    return root


def _load_crops(root, dataset, n):
    """Real fixture frames through the framework's loader + preprocessing."""
    import jax.random as jrandom

    from pixelwiseregression_tpu.data.loader import Loader
    from pixelwiseregression_tpu.data.preprocess import PreprocessConfig, preprocess_batch
    from pixelwiseregression_tpu.data.sources import SPECS, get_source

    spec = SPECS["NYU"]
    src = get_source("NYU", path=root, dataset=dataset,
                     test_only=(dataset == "test"))
    loader = Loader(src, batch_size=n, num_workers=2)
    batch = next(iter(loader))
    batch.pop("count")
    cfg = PreprocessConfig(
        fx=spec.camera.fx, fy=spec.camera.fy,
        halfu=spec.camera.halfu, halfv=spec.camera.halfv,
        image_size=2 * LABEL_SIZE, label_size=LABEL_SIZE,
    )
    data = preprocess_batch(batch, jrandom.PRNGKey(0), cfg,
                            test_only=(dataset == "test"))
    return {k: np.asarray(v) for k, v in data.items()}


# (stage, steps, threshold_mm). Round-3 measurement
# (tools/stage2_amplification.py) retired the old "chaos" story for the
# chained model: under matmul_precision=highest (verify_parity's default)
# the 2-stage trained parity measures 0.014-0.031 mm across seeds — the
# intrinsic noise gain of the chained function is only ~10-30x (torch,
# eps-perturbation), and the earlier ~1e3 "amplification" was an artifact
# of measuring at DEFAULT matmul precision (bf16-grade convs: 2.5-9 mm on
# the same weights). Stage 2 gets 0.25 mm: ~8x above the measured worst
# seed, still tight enough to catch any numerics bug class seen so far
# (the one-pass-variance bug measured ~20 mm here).
@pytest.mark.parametrize("stage,steps,threshold_mm", [(1, 60, 0.1), (2, 40, 0.25)])
def test_trained_checkpoint_parity(nyu_fixture, tmp_path, stage, steps, threshold_mm):
    import model as ref_model

    from pixelwiseregression_tpu.compat.verify_parity import main

    data = _load_crops(nyu_fixture, "train", 16)
    img = torch.from_numpy(np.transpose(data["img"], (0, 3, 1, 2)).copy()).float()
    label = torch.from_numpy(np.transpose(data["label_img"], (0, 3, 1, 2)).copy()).float()
    mask = torch.from_numpy(np.transpose(data["mask"], (0, 3, 1, 2)).copy()).float()
    uvd_t = torch.from_numpy(data["uvd"].copy()).float()

    torch.manual_seed(0)
    model_param = {
        "stage": stage, "label_size": LABEL_SIZE, "features": 32, "level": 2,
        "norm_method": "instance", "heatmap_method": "softmax",
        "kernel_size": 3,
    }
    tm = ref_model.PixelwiseRegression(14, **model_param)
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    for _ in range(steps):
        opt.zero_grad()
        results = tm(img, label, mask)
        loss = sum(((uvd - uvd_t) ** 2).sum(-1).mean() for _, _, uvd in results)
        loss.backward()
        opt.step()
    tm.eval()
    assert np.isfinite(float(loss.detach()))

    ckpt_path = str(tmp_path / f"NYU_trained{stage}_final.pt")
    torch.save(
        {"state_dict": tm.state_dict(), "seed": 0, "model_param": model_param},
        ckpt_path,
    )

    rc = main(["--ckpt", ckpt_path, "--dataset", "NYU", "--samples", "6",
               "--data_path", nyu_fixture, "--threshold_mm", str(threshold_mm)])
    assert rc == 0
