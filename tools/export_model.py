"""Export a trained checkpoint as a self-contained StableHLO serving
artifact (see pixelwiseregression_tpu/serve_artifact.py).

    python tools/export_model.py --ckpt Model/NYU_default_final.ckpt \
        --dataset NYU --output nyu_serving.pwrsrv --batch_size 32

The artifact bakes in the weights and the full on-device pipeline
(preprocess + model + decode + uvd recovery), lowered for cpu AND tpu by
default; load it with ServingArtifact.load — no flax, model code, or
checkpoint needed at serving time. Beyond-reference capability: the
reference deploys by carrying model.py + a .pt around (reference test.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help=".ckpt or reference .pt")
    p.add_argument("--dataset", required=True,
                   choices=["MSRA", "ICVL", "NYU", "HAND17"])
    p.add_argument("--output", required=True, help="artifact path (.pwrsrv)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets (default cpu,tpu)")
    p.add_argument("--poly_batch", action="store_true",
                   help="symbolic batch dim: any request size, no padding "
                        "(compiles per size at serving time; fixed batch is "
                        "the TPU-serving default)")
    p.add_argument("--quant", default="none",
                   help="int8_static requires --calib_npz for scale "
                        "calibration before the freeze")
    p.add_argument("--calib_npz",
                   help="npz with frames[N,H,W], coms[N,3] (and optional "
                        "cubes[N]) fed through predict() to calibrate "
                        "static int8 scales before export")
    # architecture flags; ignored when the checkpoint stores model_param
    p.add_argument("--stages", type=int, default=2)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--level", type=int, default=4)
    p.add_argument("--label_size", type=int, default=64)
    p.add_argument("--norm_method", default="instance")
    p.add_argument("--fullregression", action="store_true",
                   help="serve/export a FullRegression-family checkpoint")
    args = p.parse_args()

    from pixelwiseregression_tpu.cli.common import apply_platform_override

    apply_platform_override()

    import numpy as np

    from pixelwiseregression_tpu.serve import Predictor
    from pixelwiseregression_tpu.serve_artifact import export_artifact

    pred = Predictor.from_checkpoint(
        args.ckpt, args.dataset, batch_size=args.batch_size,
        stages=args.stages, features=args.features, level=args.level,
        label_size=args.label_size, norm_method=args.norm_method,
        quant=None if args.quant == "none" else args.quant,
        fullregression=args.fullregression,
    )
    if args.quant != "none" and "static" in args.quant:
        if not args.calib_npz:
            p.error("--quant int8_static needs --calib_npz calibration data")
        d = np.load(args.calib_npz)
        frames, coms = d["frames"], d["coms"]
        cubes = d["cubes"] if "cubes" in d else None
        if len(frames) == 0:
            p.error(f"--calib_npz {args.calib_npz} holds zero frames — "
                    f"refusing to bake uncalibrated (all-zero) int8 scales")
        bs = args.batch_size
        for i in range(0, len(frames), bs):
            if pred._calib_left <= 0:
                break
            pred.predict(frames[i:i + bs], coms[i:i + bs],
                         None if cubes is None else cubes[i:i + bs])
        pred._calib_left = 0  # freeze whatever the data calibrated

    header = export_artifact(pred, args.output,
                             platforms=args.platforms.split(","),
                             poly_batch=args.poly_batch)
    size = os.path.getsize(args.output)
    print(f"wrote {args.output} ({size/1e6:.1f} MB) "
          f"platforms={header['platforms']} dataset={header['dataset']} "
          f"batch={header['batch_size']}")


if __name__ == "__main__":
    main()
