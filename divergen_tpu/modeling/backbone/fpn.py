"""Feature Pyramid Network + P6/P7 extras, NHWC flax.

Counterpart of detectron2 ``modeling/backbone/fpn.py`` (FPN, LastLevelP6P7)
as configured by the reference's builders (``divergen/modeling/backbone/
timm.py:176-200`` ``build_p67_timm_fpn_backbone`` — P6/P7 branch off P5;
``swintransformer.py:716`` builds the same FPN over Swin stages). Top-down
pathway with nearest-neighbor upsampling and 1x1 lateral + 3x3 output convs.
"""
from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ..layers import ConvNorm


def _upsample_nearest_2x(x: Array) -> Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    """Builds p3..p7 (configurable) from bottom-up features.

    in_features: bottom-up names ordered fine→coarse (e.g. res3, res4, res5).
    out_channels: pyramid width (256 in every reference config).
    top_block_levels: number of extra strided levels (2 → P6, P7 from P5).
    """

    in_features: Sequence[str] = ("res3", "res4", "res5")
    out_channels: int = 256
    norm: str = ""
    top_block_levels: int = 2
    fuse_type: str = "sum"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bottom_up: Dict[str, Array]) -> Dict[str, Array]:
        feats = [bottom_up[f] for f in self.in_features]  # fine → coarse
        # first pyramid level index: stride of in_features[0]. The reference
        # names outputs p3..p5 for res3..res5 inputs; we infer from order.
        laterals = [
            ConvNorm(self.out_channels, 1, 1, self.norm, dtype=self.dtype, name=f"lateral_{f}")(x)
            for f, x in zip(self.in_features, feats)
        ]
        # top-down
        results = [laterals[-1]]
        for lat in laterals[-2::-1]:
            top = _upsample_nearest_2x(results[0])
            merged = lat + top[:, : lat.shape[1], : lat.shape[2], :]
            if self.fuse_type == "avg":
                merged = merged / 2.0
            results.insert(0, merged)
        outputs = [
            ConvNorm(self.out_channels, 3, 1, self.norm, dtype=self.dtype, name=f"output_{f}")(x)
            for f, x in zip(self.in_features, results)
        ]
        # infer the base level from the first in_feature's suffix digit
        # (res3→p3, s3→p3, "1"→p3 style names default to 3)
        tail = self.in_features[0][-1]
        base = int(tail) if tail.isdigit() else 3
        out = {f"p{base + i}": x for i, x in enumerate(outputs)}
        # LastLevelP6P7 off the last output level (in_feature='p5' per
        # build_p67_timm_fpn_backbone)
        top_feat = outputs[-1]
        lvl = base + len(outputs) - 1
        for j in range(self.top_block_levels):
            name = f"p{lvl + j + 1}"
            top_feat = ConvNorm(
                self.out_channels, 3, 2, "", dtype=self.dtype, name=f"top_{name}"
            )(nn.relu(top_feat) if j > 0 else top_feat)
            out[name] = top_feat
        return out
