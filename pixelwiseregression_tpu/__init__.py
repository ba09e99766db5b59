"""pixelwiseregression_tpu — TPU-native framework for pixel-wise 3D hand pose regression.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
IcarusWizard/PixelwiseRegression (TMM 2022, arXiv 1905.02085):

- on-device, jit-compiled preprocessing + label synthesis (crop, resize,
  augmentation, Gaussian heatmaps, depth residual maps) replacing the
  reference's cv2/numpy DataLoader-worker pipeline,
- a stacked-hourglass regression network in Flax with a differentiable
  soft-argmax decoder fused into a Pallas reduction kernel,
- data-parallel training over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
