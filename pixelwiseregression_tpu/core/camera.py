"""Pinhole camera transforms as a small jax pytree.

Replaces the reference's per-dataset methods ``xyz2uvd`` / ``uvd2xyz``
(reference: datasets.py:87-111) and ``recover_uvd`` (reference:
utils.py:332-337) with shape-polymorphic pure functions that work on host
numpy float64 (for exact index building) and on device inside jit.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp


def _xp(x):
    """numpy for host (keeps float64 exactness), jnp under trace/on device."""
    return np if isinstance(x, np.ndarray) else jnp


@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole intrinsics: focal lengths and principal point.

    Per-dataset values live in `pixelwiseregression_tpu.data.sources`
    (reference constructor defaults: datasets.py:406-409, 521-524, 693-696,
    862-865).
    """

    fx: float
    fy: float
    halfu: float
    halfv: float

    def xyz2uvd(self, x):
        """World xyz -> image-space (u, v, depth). Last axis is 3."""
        xp = _xp(x)
        u = x[..., 0] * self.fx / x[..., 2] + self.halfu
        v = x[..., 1] * self.fy / x[..., 2] + self.halfv
        return xp.stack([u, v, x[..., 2]], axis=-1)

    def uvd2xyz(self, x):
        """Image-space (u, v, depth) -> world xyz. Last axis is 3."""
        xp = _xp(x)
        gx = (x[..., 0] - self.halfu) / self.fx * x[..., 2]
        gy = (x[..., 1] - self.halfv) / self.fy * x[..., 2]
        return xp.stack([gx, gy, x[..., 2]], axis=-1)


def recover_uvd(uvd, box_size, com, threshold):
    """De-normalize network uvd back to frame coordinates.

    ``uv`` scales by ``box_size - 1``, ``d`` by ``threshold`` (the crop cube
    half-size), then the integer-truncated COM is added back
    (reference: utils.py:332-337).

    Args:
      uvd: ``[..., J, 3]`` normalized network output.
      box_size: ``[...]`` per-sample crop side length.
      com: ``[..., 3]`` per-sample integer-truncated center of mass (u, v, d).
      threshold: ``[...]`` per-sample cube half-size.
    """
    uv = uvd[..., :2] * (box_size - 1.0)[..., None, None]
    d = uvd[..., 2] * threshold[..., None]
    out = jnp.concatenate([uv, d[..., None]], axis=-1)
    return out + com[..., None, :]
