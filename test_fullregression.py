"""Inference for the FullRegression ablation (reference CLI:
test_fullregression.py)."""

from pixelwiseregression_tpu.cli.common import make_test_parser
from pixelwiseregression_tpu.cli.test_main import run_inference

if __name__ == "__main__":
    args = make_test_parser(dataset_default="NYU", fullregression=True).parse_args()
    run_inference(args, args.dataset, fullregression=True)
