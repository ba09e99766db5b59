from pixelwiseregression_tpu.data.preprocess import PreprocessConfig, preprocess_batch

__all__ = ["PreprocessConfig", "preprocess_batch"]
