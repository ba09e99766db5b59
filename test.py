"""Batch inference on a test split -> Result/<dataset>_<suffix>.txt
(reference CLI: test.py; supports HAND17 'bb' process mode and the
challenge submission rewrite)."""

from pixelwiseregression_tpu.cli.common import make_test_parser
from pixelwiseregression_tpu.cli.test_main import run_inference

if __name__ == "__main__":
    args = make_test_parser(dataset_default="MSRA").parse_args()
    run_inference(args, args.dataset)
