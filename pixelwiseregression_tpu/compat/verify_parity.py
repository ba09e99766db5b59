"""Checkpoint-parity gate: torch reference model vs converted flax model.

BASELINE.json requires converted reference ``.pt`` checkpoints to reproduce
per-joint outputs within 0.1 mm. This tool runs the same inputs through the
original torch graph (CPU) and the converted flax graph and reports the
worst per-joint delta in millimeters.

Usage:
    python -m pixelwiseregression_tpu.compat.verify_parity \
        --ckpt Model/NYU_default_final.pt --dataset NYU [--data_path ...]

With a dataset available, real test samples feed both models (through the
on-device preprocessing); otherwise synthetic crops are used. uv deltas are
converted to mm via the per-sample box size and camera intrinsics at the
hand depth; depth deltas via the cube size.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def compare_on_inputs(torch_model, flax_model, variables, img, label, mask):
    """Run both models on the same NHWC float32 inputs; return the raw
    *normalized-unit* uvd deltas (mm conversion happens in main())."""
    import torch
    import jax.numpy as jnp

    with torch.no_grad():
        t_out = torch_model(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(label, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(mask, (0, 3, 1, 2))),
        )
        t_uvd = t_out[-1][2].numpy() if isinstance(t_out[-1], tuple) else t_out[-1].numpy()

    f_out = flax_model.apply(
        variables, jnp.asarray(img), jnp.asarray(label), jnp.asarray(mask), train=False
    )
    last = f_out[-1]
    f_uvd = np.asarray(last[2] if isinstance(last, tuple) else last)
    return f_uvd - t_uvd, t_uvd, f_uvd


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="reference .pt checkpoint")
    p.add_argument("--dataset", default="NYU", help="MSRA, ICVL, NYU, HAND17")
    p.add_argument("--data_path", default=None)
    p.add_argument("--samples", type=int, default=32)
    p.add_argument("--stages", type=int, default=2)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--level", type=int, default=4)
    p.add_argument("--label_size", type=int, default=64)
    p.add_argument("--norm_method", default="instance")
    p.add_argument("--heatmap_method", default="softmax")
    p.add_argument("--filter_size", type=int, default=3)
    p.add_argument("--threshold_mm", type=float, default=0.1)
    p.add_argument("--matmul_precision", default="highest",
                   help="XLA matmul precision for the parity run")
    args = p.parse_args(argv)

    import jax

    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)

    sys.path.insert(0, "/root/reference")  # torch reference, if present
    try:
        import model as ref_model
    except ImportError:
        print("reference torch implementation not importable; aborting")
        return 2

    from pixelwiseregression_tpu.compat.torch_ckpt import convert_state_dict
    from pixelwiseregression_tpu.data.sources import SPECS
    from pixelwiseregression_tpu.models import PixelwiseRegression

    import torch

    spec = SPECS[args.dataset]
    joints = spec.joint_number
    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    variables = convert_state_dict(ckpt["state_dict"])
    model_param = ckpt.get("model_param")
    if model_param:
        for k_ours, k_ref in [("stages", "stage"), ("features", "features"),
                              ("level", "level"), ("label_size", "label_size"),
                              ("norm_method", "norm_method"),
                              ("heatmap_method", "heatmap_method"),
                              ("filter_size", "kernel_size")]:
            if k_ref in model_param:
                setattr(args, k_ours, model_param[k_ref])

    tm = ref_model.PixelwiseRegression(
        joints, stage=args.stages, label_size=args.label_size,
        features=args.features, level=args.level,
        norm_method=args.norm_method, heatmap_method=args.heatmap_method,
        kernel_size=args.filter_size,
    )
    tm.load_state_dict(ckpt["state_dict"])
    tm.eval()

    fm = PixelwiseRegression(
        joints=joints, stage=args.stages, label_size=args.label_size,
        features=args.features, level=args.level, norm_method=args.norm_method,
        heatmap_method=args.heatmap_method, kernel_size=args.filter_size,
        decoder="xla",
    )

    ims = args.label_size * 2
    n = args.samples
    rng = np.random.RandomState(0)
    if args.data_path:
        import jax.random as jrandom
        from pixelwiseregression_tpu.data.loader import Loader
        from pixelwiseregression_tpu.data.preprocess import PreprocessConfig, preprocess_batch
        from pixelwiseregression_tpu.data.sources import get_source

        src = get_source(args.dataset, path=args.data_path, dataset="test", test_only=True)
        loader = Loader(src, batch_size=n, num_workers=4)
        batch = next(iter(loader))
        batch.pop("count")
        cfg = PreprocessConfig(fx=spec.camera.fx, fy=spec.camera.fy,
                               halfu=spec.camera.halfu, halfv=spec.camera.halfv,
                               image_size=ims, label_size=args.label_size)
        data = preprocess_batch(batch, jrandom.PRNGKey(0), cfg, test_only=True)
        img = np.asarray(data["img"], np.float32)
        label = np.asarray(data["label_img"], np.float32)
        mask = np.asarray(data["mask"], np.float32)
        box = np.asarray(data["box_size"])
        cube = np.asarray(data["cube"])
        depth = np.asarray(data["com"])[:, 2]
    else:
        # synthetic full-variance inputs: low-variance (blob-like) inputs
        # through an *untrained* net make instance-norm channels nearly
        # degenerate and chaotically amplify backend float noise ~50x;
        # randn inputs keep every norm well-conditioned, which matches the
        # conditioning of trained checkpoints (prefer --data_path + a real
        # checkpoint for the authoritative gate).
        img = rng.randn(n, ims, ims, 1).astype(np.float32) * 0.3
        label = img[:, ::2, ::2]
        mask = (rng.rand(n, ims // 2, ims // 2, 1) > 0.4).astype(np.float32)
        box = np.full(n, 180.0)
        cube = np.full(n, float(spec.cube_size))
        depth = np.full(n, 600.0)

    d, t_uvd, f_uvd = compare_on_inputs(tm, fm, variables, img, label, mask)

    # mm conversion: uv normalized -> * (box-1) px -> * depth/focal mm
    # (per-axis focal length); d -> * cube
    du_mm = np.abs(d[:, :, 0]) * (box[:, None] - 1) * depth[:, None] / float(spec.camera.fx)
    dv_mm = np.abs(d[:, :, 1]) * (box[:, None] - 1) * depth[:, None] / float(spec.camera.fy)
    dd_mm = np.abs(d[:, :, 2]) * cube[:, None]
    worst = max(du_mm.max(), dv_mm.max(), dd_mm.max())
    print(f"samples: {n}   per-joint deltas (mm): "
          f"u max {du_mm.max():.5f}  v max {dv_mm.max():.5f}  d max {dd_mm.max():.5f}")
    print(f"worst per-joint delta: {worst:.5f} mm  "
          f"({'PASS' if worst <= args.threshold_mm else 'FAIL'} vs {args.threshold_mm} mm gate)")
    return 0 if worst <= args.threshold_mm else 1


if __name__ == "__main__":
    raise SystemExit(main())
