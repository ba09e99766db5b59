from pixelwiseregression_tpu.core.camera import Camera, recover_uvd

__all__ = ["Camera", "recover_uvd"]
