"""Serving API: persistent-weights batched prediction.

The reference has no serving story (inference = the test.py batch script).
For production deployment this module provides a `Predictor` that loads a
checkpoint once (native ``.ckpt`` or reference ``.pt``), keeps weights on
device, and serves fixed-size batches of raw depth frames end-to-end:
host crop-parameter precompute -> on-device preprocessing -> model ->
de-normalized uvd (and world-space xyz).

Batches are padded to the compiled batch size, so any request size up to
``batch_size`` reuses the same executable (no recompiles in the serving
path).

Example:
    pred = Predictor.from_checkpoint("Model/NYU_default_final.ckpt", "NYU")
    out = pred.predict(frames, coms, cubes)   # -> {"uvd": ..., "xyz": ...}
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.core.camera import recover_uvd
from pixelwiseregression_tpu.data.preprocess import PreprocessConfig, preprocess_batch
from pixelwiseregression_tpu.data.sources import SPECS
from pixelwiseregression_tpu.serve_artifact import _build_batch
from pixelwiseregression_tpu.models import PixelwiseRegression
from pixelwiseregression_tpu.train.checkpoint import load_checkpoint


@dataclasses.dataclass
class Predictor:
    model: PixelwiseRegression
    variables: dict
    cfg: PreprocessConfig
    spec: object
    batch_size: int
    _infer: object = None
    _calibrate: object = None
    _calib_left: int = 4  # remaining predict() batches used for static int8
    #                          calibration (quant_calib_batches, matches the CLI flag)
    _mesh: object = None
    _batch_sharding: object = None

    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        dataset: str,
        batch_size: int = 32,
        stages: int = 2,
        features: int = 128,
        level: int = 4,
        label_size: int = 64,
        norm_method: str = "instance",
        heatmap_method: str = "softmax",
        filter_size: int = 3,
        decoder: str = "xla",
        dtype=None,
        quant: Optional[str] = None,
        data_parallel: bool = False,
        quant_calib_batches: int = 4,
        fullregression: bool = False,
        compiler_options: Optional[Dict[str, str]] = None,
    ) -> "Predictor":
        """``data_parallel=True`` serves over ALL visible chips: weights are
        replicated on a 1-D ('data',) mesh and each request batch is sharded
        on axis 0 — same pjit program as training's data parallelism
        (parallel/mesh.py), so throughput scales with the slice size.
        ``batch_size`` must divide by the device count.

        ``fullregression=True`` serves the FullRegression family
        (train_fullregression.py checkpoints; reference model.py
        FullRegression) — same request/response contract; int8 quant is a
        PixelwiseRegression-only path (its convs carry the quant
        epilogues)."""
        from pixelwiseregression_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        spec = SPECS[dataset]

        # honor the architecture stored in the checkpoint (reference .pt
        # files carry model_param; our .ckpt files store it too)
        from pixelwiseregression_tpu.train.checkpoint import peek_model_param

        model_param = peek_model_param(path)
        if model_param:
            stages = model_param.get("stage", stages)
            features = model_param.get("features", features)
            level = model_param.get("level", level)
            label_size = model_param.get("label_size", label_size)
            norm_method = model_param.get("norm_method", norm_method)
            heatmap_method = model_param.get("heatmap_method", heatmap_method)
            filter_size = model_param.get("kernel_size", filter_size)
        image_size = label_size * 2

        if fullregression:
            if quant not in (None, "none"):
                raise ValueError("quant serving is PixelwiseRegression-only "
                                 "(FullRegression convs carry no quant "
                                 "epilogues)")
            from pixelwiseregression_tpu.models import FullRegression

            model = FullRegression(
                joints=spec.joint_number, stage=stages,
                label_size=label_size, features=features, level=level,
                norm_method=norm_method,
                dtype=dtype if dtype is not None else jnp.float32,
            )
        else:
            model = PixelwiseRegression(
                joints=spec.joint_number, stage=stages, label_size=label_size,
                features=features, level=level, kernel_size=filter_size,
                norm_method=norm_method, heatmap_method=heatmap_method,
                decoder=decoder,
                dtype=dtype if dtype is not None else jnp.float32,
                quant=None if quant in (None, "none") else quant,
            )
        template = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, image_size, image_size, 1)),
            jnp.zeros((1, label_size, label_size, 1)),
            jnp.zeros((1, label_size, label_size, 1)),
            train=False,
        )
        ckpt = load_checkpoint(path, params_template=template["params"])
        mesh = bsh = None
        if data_parallel:
            from pixelwiseregression_tpu.parallel.mesh import (
                batch_sharding, make_mesh, replicated,
            )

            mesh = make_mesh()
            n_dev = mesh.devices.size
            assert batch_size % n_dev == 0, (
                f"batch_size {batch_size} must divide over {n_dev} devices"
            )
            bsh = batch_sharding(mesh)
            put = lambda t: jax.device_put(t, replicated(mesh))
        else:
            put = jax.device_put
        variables = {"params": put(ckpt["params"])}
        if ckpt["batch_stats"]:
            variables["batch_stats"] = put(ckpt["batch_stats"])

        cfg = PreprocessConfig(
            fx=spec.camera.fx, fy=spec.camera.fy,
            halfu=spec.camera.halfu, halfv=spec.camera.halfv,
            image_size=image_size, label_size=label_size,
        )
        self = cls(model=model, variables=variables, cfg=cfg, spec=spec,
                   batch_size=batch_size, _mesh=mesh, _batch_sharding=bsh,
                   _calib_left=quant_calib_batches)

        # compiler_options: per-jit env_option_overrides for the backend
        # compiler (xla_tpu_* knobs — the tunnel rejects them via XLA_FLAGS)
        @partial(jax.jit, compiler_options=compiler_options)
        def infer(variables, batch):
            data = preprocess_batch(batch, jax.random.PRNGKey(0), cfg, test_only=True)
            results = model.apply(
                variables, data["img"], data["label_img"], data["mask"], train=False
            )
            uvd = (results[-1] if fullregression else results[-1][2])
            uvd = uvd.astype(jnp.float32)
            return recover_uvd(uvd, data["box_size"], data["com"], data["cube"])

        self._infer = infer

        if quant and "static" in quant:
            # static int8 scales: calibrated transparently on the first
            # few predict() batches (running per-channel |x| max,
            # models/layers.py:_Int8Conv2D)
            @jax.jit
            def calibrate(variables, batch):
                data = preprocess_batch(batch, jax.random.PRNGKey(0), cfg, test_only=True)
                _, upd = model.apply(
                    variables, data["img"], data["label_img"], data["mask"],
                    train=False, mutable=["quant_scales"],
                )
                return upd

            self._calibrate = calibrate
        return self

    def predict(
        self,
        frames: np.ndarray,
        coms: np.ndarray,
        cubes: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """Predict joints for up to ``batch_size`` raw depth frames.

        Args:
          frames: ``[N, H, W]`` raw depth in mm (dataset frame size).
          coms: ``[N, 3]`` hand centers (u, v, depth-mm).
          cubes: ``[N]`` crop cube half-sizes (dataset default if None).

        Returns dict with ``uvd`` ``[N, J, 3]`` (frame coords + mm) and
        ``xyz`` ``[N, J, 3]`` (world mm).
        """
        batch, count = _build_batch(self.spec, self.batch_size, frames, coms, cubes)
        if self._batch_sharding is not None:
            batch = {k: jax.device_put(v, self._batch_sharding)
                     for k, v in batch.items()}
        if self._calibrate is not None and self._calib_left > 0:
            self.variables = dict(self.variables, **self._calibrate(self.variables, batch))
            self._calib_left -= 1
        uvd = np.asarray(self._infer(self.variables, batch))[:count]
        xyz = np.asarray(self.spec.camera.uvd2xyz(uvd))
        return {"uvd": uvd, "xyz": xyz}
