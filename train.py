"""Train PixelwiseRegression on NYU/ICVL/HAND17 (reference CLI: train.py).

TPU-native: on-device preprocessing fused into the jitted train step,
data-parallel over all visible chips. Flags mirror the reference.
"""

from pixelwiseregression_tpu.cli.common import make_train_parser
from pixelwiseregression_tpu.cli.train_main import run_training

if __name__ == "__main__":
    args = make_train_parser(dataset_default="NYU").parse_args()
    run_training(args, args.dataset)
