"""Interactive viewer of processed samples/masks/skeletons
(reference CLI: check_samples.py)."""

import argparse

import numpy as np

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="MSRA",
                        help="choose from MSRA, ICVL, NYU, HAND17")
    parser.add_argument("--set", type=str, default="train",
                        help="choose from train and test")
    parser.add_argument("--using_rotation", action="store_true")
    parser.add_argument("--using_scale", action="store_true")
    parser.add_argument("--using_shift", action="store_true")
    parser.add_argument("--using_flip", action="store_true")
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument("--max_samples", type=int, default=None,
                        help="stop after N samples (headless smoke runs)")
    args = parser.parse_args()

    import matplotlib.pyplot as plt
    import jax

    from pixelwiseregression_tpu.cli.common import apply_platform_override

    apply_platform_override()

    from pixelwiseregression_tpu.data.loader import Loader
    from pixelwiseregression_tpu.data.preprocess import PreprocessConfig, preprocess_batch
    from pixelwiseregression_tpu.data.sources import get_source
    from pixelwiseregression_tpu.utils.viz import draw_skeleton_normalized

    test_only = args.set == "test"
    dataset = get_source(args.dataset, path=args.data_path, dataset=args.set,
                         test_only=test_only)
    spec = dataset.spec
    cfg = PreprocessConfig(
        fx=spec.camera.fx, fy=spec.camera.fy,
        halfu=spec.camera.halfu, halfv=spec.camera.halfv,
        using_rotation=args.using_rotation, using_scale=args.using_scale,
        using_shift=args.using_shift, using_flip=args.using_flip,
    )

    loader = Loader(dataset, batch_size=1, shuffle=True, num_workers=1)
    key = jax.random.PRNGKey(0)
    shown = 0
    for batch in loader:
        batch.pop("count")
        key, sub = jax.random.split(key)
        out = preprocess_batch(batch, sub, cfg, test_only=test_only,
                               augment=not test_only)
        img = np.asarray(out["img"][0, :, :, 0])
        mask = np.asarray(out["mask"][0, :, :, 0])

        if not test_only:
            skeleton = draw_skeleton_normalized(img, np.asarray(out["uvd"][0]), dataset.config)
            fig, ax = plt.subplots()
            ax.imshow(skeleton)

        fig, ax = plt.subplots()
        ax.imshow(img)
        fig, ax = plt.subplots()
        ax.imshow(mask)
        plt.show()
        plt.close("all")
        shown += 1
        if args.max_samples is not None and shown >= args.max_samples:
            break
