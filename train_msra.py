"""Train PixelwiseRegression on one MSRA leave-one-subject-out fold
(reference CLI: train_msra.py; --subject picks the held-out subject)."""

from pixelwiseregression_tpu.cli.common import make_train_parser
from pixelwiseregression_tpu.cli.train_main import run_training

if __name__ == "__main__":
    args = make_train_parser(msra=True).parse_args()
    run_training(args, "MSRA", subject=args.subject)
