"""Train the FullRegression ablation (direct regression, uvd-only loss)
(reference CLI: train_fullregression.py)."""

from pixelwiseregression_tpu.cli.common import make_train_parser
from pixelwiseregression_tpu.cli.train_main import run_training

if __name__ == "__main__":
    args = make_train_parser(suffix_default="full_regression", fullregression=True).parse_args()
    run_training(args, args.dataset, fullregression=True)
