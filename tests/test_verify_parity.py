"""The parity-gate CLI passes on a randomly-initialized reference checkpoint."""

import os
import sys

import pytest

torch = pytest.importorskip("torch")
if not os.path.isdir("/root/reference"):
    pytest.skip("reference repo not available", allow_module_level=True)

sys.path.insert(0, "/root/reference")


def test_parity_gate_passes_on_reference_checkpoint(tmp_path):
    import model as ref_model
    from pixelwiseregression_tpu.compat.verify_parity import main

    torch.manual_seed(0)
    tm = ref_model.PixelwiseRegression(
        14, stage=1, label_size=64, features=32, level=2,
        norm_method="instance", heatmap_method="softmax",
    )
    ckpt_path = str(tmp_path / "NYU_test_final.pt")
    torch.save(
        {
            "state_dict": tm.state_dict(),
            "seed": 0,
            "model_param": {
                "stage": 1, "label_size": 64, "features": 32, "level": 2,
                "norm_method": "instance", "heatmap_method": "softmax",
                "kernel_size": 3,
            },
        },
        ckpt_path,
    )
    rc = main(["--ckpt", ckpt_path, "--dataset", "NYU", "--samples", "8"])
    assert rc == 0  # worst per-joint delta within the 0.1 mm gate
