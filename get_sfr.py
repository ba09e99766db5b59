"""Paper-figure generator: compares heatmaps/depthmaps of checkpoint variants
(detection / mix / regression) for selected joints (reference CLI: get_sfr.py,
which contrasts alpha=0 / alpha=0.5 / alpha=1 NYU checkpoints)."""

import argparse
import os

import numpy as np

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="NYU")
    parser.add_argument("--suffixes", type=str, nargs="+",
                        default=["detection", "mix", "regression"],
                        help="checkpoint suffixes to compare")
    parser.add_argument("--joints_to_show", type=int, nargs="+", default=[0, 3, 9])
    parser.add_argument("--num_samples", type=int, default=4)
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
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument("--out", type=str, default="Result/sfr.png")
    args = parser.parse_args()
    args.decoder = "xla"
    args.matmul_precision = None

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
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

    testset = get_source(args.dataset, path=args.data_path, dataset="test", test_only=True)
    spec = testset.spec
    image_size = args.label_size * 2
    cfg = PreprocessConfig(
        fx=spec.camera.fx, fy=spec.camera.fy, halfu=spec.camera.halfu,
        halfv=spec.camera.halfv, image_size=image_size, label_size=args.label_size,
        kernel_size=args.kernel_size, sigma=args.sigmoid,
    )
    model = PixelwiseRegression(**model_kwargs_from_args(args, testset.joint_number))
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, image_size, image_size, 1)),
        jnp.zeros((1, args.label_size, args.label_size, 1)),
        jnp.zeros((1, args.label_size, args.label_size, 1)),
        train=False,
    )

    loader = Loader(testset, batch_size=args.num_samples, shuffle=True, num_workers=2)
    batch = next(iter(loader))
    batch.pop("count")
    data = preprocess_batch(batch, jax.random.PRNGKey(0), cfg, test_only=True)

    rows = []
    for suffix in args.suffixes:
        base = f"{args.dataset}_{suffix}_{args.seed}"
        path = next(
            (os.path.join("Model", base + ext) for ext in (".ckpt", ".pt")
             if os.path.exists(os.path.join("Model", base + ext))),
            None,
        )
        if path is None:
            print(f"skipping {suffix}: no checkpoint {base}")
            continue
        ckpt = load_checkpoint(path, params_template=template["params"])
        variables = {"params": ckpt["params"]}
        if ckpt["batch_stats"]:
            variables["batch_stats"] = ckpt["batch_stats"]
        results = model.apply(variables, data["img"], data["label_img"], data["mask"], train=False)
        hm, dm, _ = results[-1]
        rows.append((suffix, np.asarray(hm), np.asarray(dm)))

    if not rows:
        raise SystemExit("no checkpoints found for any suffix")

    n_j = len(args.joints_to_show)
    fig, axes = plt.subplots(
        len(rows) * 2, args.num_samples * n_j,
        figsize=(2 * args.num_samples * n_j, 4 * len(rows)), squeeze=False,
    )
    for r, (suffix, hm, dm) in enumerate(rows):
        for s in range(args.num_samples):
            for k, j in enumerate(args.joints_to_show):
                col = s * n_j + k
                axes[2 * r][col].imshow(hm[s, :, :, j], cmap="jet")
                axes[2 * r][col].set_title(f"{suffix} hm j{j}", fontsize=6)
                axes[2 * r][col].axis("off")
                axes[2 * r + 1][col].imshow(dm[s, :, :, j], cmap="jet")
                axes[2 * r + 1][col].set_title(f"{suffix} dm j{j}", fontsize=6)
                axes[2 * r + 1][col].axis("off")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=150, bbox_inches="tight")
    print(f"saved {args.out}")
