from pixelwiseregression_tpu.utils.viz import draw_skeleton, draw_features
from pixelwiseregression_tpu.utils.seeding import setup_seed

__all__ = ["draw_skeleton", "draw_features", "setup_seed"]
