"""MSRA per-subject inference with FPS print (reference CLI: test_msra.py)."""

from pixelwiseregression_tpu.cli.common import make_test_parser
from pixelwiseregression_tpu.cli.test_main import run_inference

if __name__ == "__main__":
    args = make_test_parser(msra=True).parse_args()
    run_inference(args, "MSRA", subject=args.subject)
