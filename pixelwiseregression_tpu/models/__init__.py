from pixelwiseregression_tpu.models.pixelwise import (
    PixelwiseRegression,
    PredictionBlock,
    Hourglass,
    ResBlock,
)
from pixelwiseregression_tpu.models.fullregression import FullRegression

__all__ = [
    "PixelwiseRegression",
    "PredictionBlock",
    "Hourglass",
    "ResBlock",
    "FullRegression",
]
