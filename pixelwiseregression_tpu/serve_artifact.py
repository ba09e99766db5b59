"""Self-contained serving artifacts via ``jax.export`` (StableHLO).

The reference ships inference only as a torch script reading a ``.pt``
checkpoint next to the model source (reference test.py / model.py) — a
deployment must carry the exact model code, flax/torch, and the weights,
and any drift between them changes predictions silently. This module
freezes the WHOLE jitted serving function — on-device preprocessing
(data/preprocess.py), the model forward, the soft-argmax decode and uvd
de-normalization — together with the trained weights into one portable
StableHLO artifact:

  * weights are baked in as constants: one file is the deployable unit;
  * lowered for BOTH ``cpu`` and ``tpu`` by default (multi-platform
    export), so the same artifact serves on a dev box and a TPU pod-slice;
  * loading needs jax but NOT flax, NOT the model code, and NOT the
    checkpoint — the artifact is immune to model-code drift by
    construction (StableHLO forward/backward-compatibility guarantees).

Host-side record precompute (float64 crop-int semantics, ``_build_batch``
below — deliberately in this flax-free module so loading an artifact never
imports the model stack) stays in Python — it is dataset geometry, not
model — and its parameters ride in the artifact header.

Format: ``PWRSRV1\\n`` magic, uint32-LE header length, JSON header
(dataset/batch/frame geometry + provenance), then the ``jax.export``
payload.

Round-trip parity vs the live ``Predictor`` is exact (tests/test_serve.py).
"""

from __future__ import annotations

import dataclasses
import json
import struct
from typing import Dict, Optional, Sequence

import numpy as np

import jax

from pixelwiseregression_tpu.data.loader import stack_records
from pixelwiseregression_tpu.data.sources import SPECS, load_bbox, make_record

_MAGIC = b"PWRSRV1\n"


def _build_batch(spec, batch_size: int, frames, coms, cubes):
    """Host-side record precompute shared by live and exported serving:
    raw frames + hand centers -> padded device-ready batch (same float64
    crop-int semantics as the dataset sources, data/sources.py make_record)."""
    n = frames.shape[0]
    assert 1 <= n <= batch_size, f"request size {n} > batch_size {batch_size}"
    if cubes is None:
        cubes = np.full(n, spec.cube_size)
    records = []
    for i in range(n):
        com = np.asarray(coms[i], np.float64)
        cube = float(cubes[i])
        # same load-time background bbox as the dataset sources
        # (sources.py load_bbox; MSRA has none)
        bbox = load_bbox(spec, com, cube) if spec.bbox_margin is not None else None
        records.append(
            make_record(spec, frames[i].astype(np.float64), None, com, cube, bbox)
        )
    batch, count = stack_records(records, pad_to=batch_size)
    batch.pop("weight")
    return batch, count


def export_artifact(
    pred,
    path: str,
    platforms: Sequence[str] = ("cpu", "tpu"),
    poly_batch: bool = False,
) -> Dict:
    """Freeze ``pred`` (a serve.Predictor) into a StableHLO artifact.

    Weights (params + batch_stats + calibrated quant scales) are embedded
    as constants. Multi-platform export requires every op to lower on every
    target, so the portable default needs the XLA decoder; the Pallas
    decoder (TPU Mosaic) exports TPU-only. Static-int8 predictors must be
    fully calibrated first (their scales are baked in like any weight).

    ``poly_batch=True`` exports with a SYMBOLIC batch dimension: the
    artifact accepts any request size with no padding waste, at the cost
    of one compile per distinct size at serving time. The default fixed
    batch pads requests to one pre-compiled executable — the right call
    for TPU serving; poly is for CPU/edge deployments where padding
    compute dominates.

    Returns the header dict that was written.
    """
    from jax import export as jexport

    if getattr(pred, "_mesh", None) is not None:
        raise ValueError(
            "export_artifact: data_parallel Predictors are not exportable — "
            "the artifact targets single-device serving; shard requests "
            "across artifact replicas instead"
        )
    if pred._calibrate is not None and pred._calib_left > 0:
        raise ValueError(
            f"export_artifact: static int8 predictor still has "
            f"{pred._calib_left} calibration batches pending — run "
            f"predict() on representative data first so the baked scales "
            f"are real"
        )
    decoder = getattr(pred.model, "decoder", "xla")  # FullRegression has none
    if decoder != "xla" and set(platforms) != {"tpu"}:
        raise ValueError(
            f"export_artifact: decoder={decoder!r} only lowers "
            f"for TPU (Mosaic); use platforms=('tpu',) or decoder='xla'"
        )

    spec = pred.spec
    dummy = np.zeros((1, spec.frame_h, spec.frame_w), np.float64)
    template, _ = _build_batch(
        spec, pred.batch_size, dummy, np.array([[1.0, 1.0, 400.0]]), None
    )
    if poly_batch:
        from jax import export as _je

        b_dim = _je.symbolic_shape("b")[0]
        arg_specs = {
            k: jax.ShapeDtypeStruct((b_dim,) + np.shape(v)[1:],
                                    np.asarray(v).dtype)
            for k, v in template.items()
        }
    else:
        arg_specs = {
            k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)
            for k, v in template.items()
        }

    variables = pred.variables  # baked in as module constants
    infer = pred._infer
    frozen = jax.jit(lambda batch: infer(variables, batch))
    exported = jexport.export(frozen, platforms=tuple(platforms))(arg_specs)
    payload = bytes(exported.serialize())

    header = {
        "dataset": spec.name,
        "batch_size": None if poly_batch else pred.batch_size,
        "frame_h": spec.frame_h,
        "frame_w": spec.frame_w,
        "joint_number": spec.joint_number,
        "platforms": list(exported.platforms),
        "batch_fields": sorted(template.keys()),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
    }
    head = json.dumps(header, sort_keys=True).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(head)))
        f.write(head)
        f.write(payload)
    return header


@dataclasses.dataclass
class ServingArtifact:
    """A loaded artifact: ``predict(frames, coms, cubes)`` like Predictor.

    Needs only jax + this package's host-side geometry code (no flax, no
    model definitions, no checkpoint files).
    """

    header: Dict
    _exported: object
    _spec: object

    @classmethod
    def load(cls, path: str) -> "ServingArtifact":
        from jax import export as jexport

        with open(path, "rb") as f:
            magic = f.read(len(_MAGIC))
            if magic != _MAGIC:
                raise ValueError(
                    f"{path}: not a pixelwiseregression serving artifact "
                    f"(bad magic {magic!r})"
                )
            (hlen,) = struct.unpack("<I", f.read(4))
            header = json.loads(f.read(hlen))
            exported = jexport.deserialize(bytearray(f.read()))
        return cls(header=header, _exported=exported,
                   _spec=SPECS[header["dataset"]])

    @property
    def platforms(self):
        return tuple(self.header["platforms"])

    def predict(
        self,
        frames: np.ndarray,
        coms: np.ndarray,
        cubes: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """Same contract as serve.Predictor.predict (uvd + world xyz).

        Fixed-batch artifacts pad to their compiled size; poly-batch
        artifacts (header batch_size null) run the exact request size."""
        pad_to = self.header["batch_size"] or len(frames)
        batch, count = _build_batch(self._spec, pad_to, frames, coms, cubes)
        uvd = np.asarray(self._exported.call(batch))[:count]
        xyz = np.asarray(self._spec.camera.uvd2xyz(uvd))
        return {"uvd": uvd, "xyz": xyz}
