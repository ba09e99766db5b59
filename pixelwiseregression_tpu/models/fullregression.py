"""FullRegression — the paper's direct-regression ablation model.

Reference: model.py:215-308. Same stem + hourglass as PixelwiseRegression,
but each stage decodes by 3 stride-2 convs -> flatten -> MLP(1024, 1024, J*3)
instead of soft-argmax; stage chaining concatenates (f, label_img).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from pixelwiseregression_tpu.models.layers import (
    Conv,
    apply_norm,
    make_norm,
    torch_uniform_init,
)
from pixelwiseregression_tpu.models.pixelwise import Hourglass


class _Dense(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # NOTE: the reference's xavier init hook only touches Conv2d weights
        # (utils.py:339-342), so Linear layers keep torch's defaults:
        # kaiming-uniform weight (a=sqrt(5)) and uniform bias, both bounded
        # by 1/sqrt(fan_in) and symmetric around zero.
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=torch_uniform_init(fan_in),
            bias_init=torch_uniform_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dense",
        )(x)


class FullRegressionBlock(nn.Module):
    joints: int
    label_size: int = 64
    features: int = 256
    level: int = 4
    norm_method: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, label_img, mask, train: bool = False):
        norm = make_norm(self.norm_method, self.dtype)
        f = Conv(self.features, 1, dtype=self.dtype, name="proj")(x)
        f = Hourglass(
            features=self.features,
            level=self.level,
            norm_method=self.norm_method,
            dtype=self.dtype,
            name="hourglass",
        )(f, train)

        h = f
        for i in range(3):
            h = Conv(self.features, 3, stride=2, dtype=self.dtype, name=f"down_conv_{i}")(h)
            h = apply_norm(norm(name=f"down_norm_{i}"), h, train)
            h = nn.relu(h)

        # torch flattens NCHW as C*H*W; transpose NHWC -> NCHW first so the
        # converted Linear weights line up (reference: model.py:248-249).
        b = h.shape[0]
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(b, -1)

        h = nn.relu(_Dense(1024, dtype=self.dtype, name="fc_0")(h))
        h = nn.relu(_Dense(1024, dtype=self.dtype, name="fc_1")(h))
        coords = _Dense(self.joints * 3, dtype=self.dtype, name="fc_2")(h)
        coords = coords.reshape(b, self.joints, 3).astype(jnp.float32)
        return f, coords


class FullRegression(nn.Module):
    """Returns a list of per-stage uvd ``[B, J, 3]`` (reference: model.py:300-308)."""

    joints: int
    stage: int = 2
    label_size: int = 64
    features: int = 256
    level: int = 4
    norm_method: str = "instance"
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, label_img, mask, train: bool = False):
        norm = make_norm(self.norm_method, self.dtype)
        x = img.astype(self.dtype)
        label_img = label_img.astype(self.dtype)

        widths = [32]
        while widths[-1] < self.features:
            widths.append(2 * widths[-1])
        i = 0
        for w_ in widths:
            x = Conv(w_, 3, dtype=self.dtype, name=f"stem_conv_{i}")(x)
            x = apply_norm(norm(name=f"stem_norm_{i}"), x, train)
            x = nn.relu(x)
            i += 1
        x = Conv(self.features, 3, stride=2, dtype=self.dtype, name=f"stem_conv_{i}")(x)
        x = apply_norm(norm(name=f"stem_norm_{i}"), x, train)
        x = nn.relu(x)

        results = []
        f = x
        block_cls = (
            nn.remat(FullRegressionBlock, static_argnums=(4,))
            if self.remat else FullRegressionBlock
        )
        for s in range(self.stage):
            # QUIRK(parity): the reference never forwards `level` to its
            # blocks (model.py:292-294 passes it positionally into the
            # `level=4` default slot), so blocks always use level=4.
            f, uvd = block_cls(
                joints=self.joints,
                label_size=self.label_size,
                features=self.features,
                level=4,
                norm_method=self.norm_method,
                dtype=self.dtype,
                name=f"stage_{s}",
            )(f, label_img, mask, train)
            results.append(uvd)
            f = jnp.concatenate([f, label_img], axis=-1)
        return results
