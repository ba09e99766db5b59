from pixelwiseregression_tpu.ops.image import (
    crop_resize,
    resize_bilinear,
    warp_affine_inverse,
    rotation_matrix_inverse,
    gaussian_kernel_1d,
    gaussian_blur,
)
from pixelwiseregression_tpu.ops.heatmap import (
    com_filter,
    splat_heatmap,
    synthesize_labels,
)
from pixelwiseregression_tpu.ops.softargmax import soft_argmax_decode

__all__ = [
    "crop_resize",
    "resize_bilinear",
    "warp_affine_inverse",
    "rotation_matrix_inverse",
    "gaussian_kernel_1d",
    "gaussian_blur",
    "com_filter",
    "splat_heatmap",
    "synthesize_labels",
    "soft_argmax_decode",
]
