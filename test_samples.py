"""Interactive viewer: ground-truth vs predicted skeletons on processed
samples, save on 's' (reference CLI: test_samples.py)."""

import argparse
import os

import numpy as np

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--suffix", type=str, default="default")
    parser.add_argument("--dataset", type=str, default="NYU",
                        help="choose from MSRA, ICVL, NYU, HAND17")
    parser.add_argument("--set", type=str, default="test", help="choose from train, val and test")
    parser.add_argument("--label_size", type=int, default=64)
    parser.add_argument("--kernel_size", type=int, default=7)
    parser.add_argument("--sigmoid", type=float, default=1.5)
    parser.add_argument("--norm_method", type=str, default="instance")
    parser.add_argument("--heatmap_method", type=str, default="softmax")
    parser.add_argument("--filter_size", type=int, default=3)
    parser.add_argument("--stages", type=int, default=2)
    parser.add_argument("--features", type=int, default=128)
    parser.add_argument("--level", type=int, default=4)
    parser.add_argument("--seed", type=str, default="final")
    parser.add_argument("--subject", type=int, default=None)
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument("--save_dir", type=str, default="Samples")
    parser.add_argument("--max_samples", type=int, default=None,
                        help="stop after N samples")
    parser.add_argument("--headless", action="store_true",
                        help="no interactive window: save every sample "
                             "canvas to --save_dir instead")
    args = parser.parse_args()
    args.decoder = "xla"
    args.matmul_precision = None

    import cv2
    import jax
    import jax.numpy as jnp

    from pixelwiseregression_tpu.cli.common import (
        apply_platform_override,
        model_kwargs_from_args,
    )

    apply_platform_override()
    from pixelwiseregression_tpu.data.loader import Loader
    from pixelwiseregression_tpu.data.preprocess import PreprocessConfig, preprocess_batch
    from pixelwiseregression_tpu.data.sources import get_source
    from pixelwiseregression_tpu.models import PixelwiseRegression
    from pixelwiseregression_tpu.train.checkpoint import load_checkpoint
    from pixelwiseregression_tpu.utils.viz import draw_skeleton_normalized

    source_kw = dict(path=args.data_path, dataset=args.set, test_only=False)
    if args.subject is not None:
        source_kw["subject"] = args.subject
    ds_name = args.dataset
    testset = get_source(ds_name, **source_kw)
    spec = testset.spec

    image_size = args.label_size * 2
    cfg = PreprocessConfig(
        fx=spec.camera.fx, fy=spec.camera.fy, halfu=spec.camera.halfu,
        halfv=spec.camera.halfv, image_size=image_size, label_size=args.label_size,
        kernel_size=args.kernel_size, sigma=args.sigmoid,
    )

    model = PixelwiseRegression(**model_kwargs_from_args(args, testset.joint_number))
    suffix = args.suffix if args.subject is None else f"{args.suffix}_subject{args.subject}"
    base = f"{ds_name}_{suffix}_{args.seed}"
    ckpt_file = next(
        os.path.join("Model", base + ext) for ext in (".ckpt", ".pt")
        if os.path.exists(os.path.join("Model", base + ext))
    )
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, image_size, image_size, 1)),
        jnp.zeros((1, args.label_size, args.label_size, 1)),
        jnp.zeros((1, args.label_size, args.label_size, 1)),
        train=False,
    )
    ckpt = load_checkpoint(ckpt_file, params_template=template["params"])
    variables = {"params": ckpt["params"]}
    if ckpt["batch_stats"]:
        variables["batch_stats"] = ckpt["batch_stats"]

    @jax.jit
    def infer(batch):
        data = preprocess_batch(batch, jax.random.PRNGKey(0), cfg)
        results = model.apply(variables, data["img"], data["label_img"], data["mask"], train=False)
        return data, results[-1][2]

    os.makedirs(args.save_dir, exist_ok=True)
    loader = Loader(testset, batch_size=1, shuffle=True, num_workers=1)
    idx = 0
    for batch in loader:
        batch.pop("count")
        data, uvd = infer(batch)
        img = np.asarray(data["img"][0, :, :, 0])
        gt = draw_skeleton_normalized(img, np.asarray(data["uvd"][0]), testset.config)
        pred = draw_skeleton_normalized(img, np.asarray(uvd[0]), testset.config)
        canvas = np.concatenate([gt, pred], axis=1)
        if args.headless:
            cv2.imwrite(os.path.join(args.save_dir, f"sample_{idx}.png"),
                        (canvas[:, :, ::-1] * 255).astype(np.uint8))
        else:
            cv2.imshow("gt | prediction (q quit, s save)", canvas[:, :, ::-1])
            k = cv2.waitKey(0) & 0xFF
            if k == ord("q"):
                break
            if k == ord("s"):
                cv2.imwrite(os.path.join(args.save_dir, f"sample_{idx}.png"),
                            (canvas[:, :, ::-1] * 255).astype(np.uint8))
        idx += 1
        if args.max_samples is not None and idx >= args.max_samples:
            break
