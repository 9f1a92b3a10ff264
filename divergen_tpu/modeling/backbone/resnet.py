"""ResNet backbone (bottleneck), NHWC flax.

Counterpart of detectron2 ``modeling/backbone/resnet.py`` and the reference's
TIMM wrapper (``DiverGen/divergen/modeling/backbone/timm.py:109-200``,
``resnet50_in21k``). Emits a dict of stage features ``res2..res5`` with
strides 4/8/16/32. ``stride_in_1x1`` follows detectron2's Caffe-style
default. Frozen-BN is the default norm (affine-only, see layers.py) so
pretrained torch weights map over directly.
"""
from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..layers import ConvNorm, get_norm

_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    norm: str = "FrozenBN"
    stride_in_1x1: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = ConvNorm(self.bottleneck_channels, 1, s1, self.norm, nn.relu, dtype=self.dtype, name="conv1")(x)
        out = ConvNorm(self.bottleneck_channels, 3, s3, self.norm, nn.relu, dtype=self.dtype, name="conv2")(out)
        out = ConvNorm(self.out_channels, 1, 1, self.norm, None, dtype=self.dtype, name="conv3")(out)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            x = ConvNorm(self.out_channels, 1, self.stride, self.norm, None, dtype=self.dtype, name="shortcut")(x)
        return nn.relu(out + x)


class ResNet(nn.Module):
    depth: int = 50
    norm: str = "FrozenBN"
    out_features: Sequence[str] = ("res3", "res4", "res5")
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        # deep-stem off: detectron2 BasicStem = 7x7/2 conv + maxpool/2
        x = ConvNorm(self.stem_out_channels, 7, 2, self.norm, nn.relu, dtype=self.dtype, name="stem")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outputs: Dict[str, Array] = {}
        num_blocks = _BLOCKS[self.depth]
        out_ch = self.res2_out_channels
        bott_ch = out_ch // 4
        for stage_idx, n in enumerate(num_blocks):
            name = f"res{stage_idx + 2}"
            stride = 1 if stage_idx == 0 else 2
            for i in range(n):
                x = Bottleneck(
                    out_ch,
                    bott_ch,
                    stride=stride if i == 0 else 1,
                    norm=self.norm,
                    stride_in_1x1=self.stride_in_1x1,
                    dtype=self.dtype,
                    name=f"{name}_block{i}",
                )(x)
            if name in self.out_features:
                outputs[name] = x
            out_ch *= 2
            bott_ch *= 2
        return outputs

    @staticmethod
    def out_channels(depth: int, res2_out_channels: int = 256) -> Dict[str, int]:
        return {f"res{i + 2}": res2_out_channels * (2**i) for i in range(4)}


class Bottle2neck(nn.Module):
    """Res2Net bottleneck: the middle 3x3 becomes ``scale`` hierarchical
    convolutions over channel splits (CenterNet2 vendored
    ``centernet/modeling/backbone/res2net.py`` Bottle2neck semantics;
    26w x 4s default). ``stype='stage'`` (stride/downsample blocks) skips the
    additive chaining and average-pools the last split."""

    out_channels: int
    bottleneck_channels: int  # = width * scale
    stride: int = 1
    scale: int = 4
    norm: str = "FrozenBN"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        stype = "stage" if self.stride != 1 or x.shape[-1] != self.out_channels else "normal"
        width = self.bottleneck_channels // self.scale
        out = ConvNorm(self.bottleneck_channels, 1, 1, self.norm, nn.relu,
                       dtype=self.dtype, name="conv1")(x)
        splits = jnp.split(out, self.scale, axis=-1)
        outs = []
        prev = None
        for i in range(self.scale - 1):
            sp = splits[i]
            if i > 0 and stype == "normal":
                sp = sp + prev
            sp = ConvNorm(width, 3, self.stride, self.norm, nn.relu,
                          dtype=self.dtype, name=f"conv2_{i}")(sp)
            prev = sp
            outs.append(sp)
        last = splits[-1]
        if stype == "stage" and self.stride != 1:
            last = nn.avg_pool(last, (3, 3), strides=(self.stride, self.stride),
                               padding=((1, 1), (1, 1)))
        outs.append(last)
        out = jnp.concatenate(outs, axis=-1)
        out = ConvNorm(self.out_channels, 1, 1, self.norm, None, dtype=self.dtype, name="conv3")(out)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            x = ConvNorm(self.out_channels, 1, self.stride, self.norm, None,
                         dtype=self.dtype, name="shortcut")(x)
        return nn.relu(out + x)


class Res2Net(nn.Module):
    """Res2Net-v1b (deep stem) backbone, drop-in for ResNet in the FPN."""

    depth: int = 50
    width: int = 26
    scale: int = 4
    norm: str = "FrozenBN"
    out_features: Sequence[str] = ("res3", "res4", "res5")
    res2_out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        # v1b deep stem: three 3x3 convs (32, 32, 64) then maxpool
        x = ConvNorm(32, 3, 2, self.norm, nn.relu, dtype=self.dtype, name="stem1")(x)
        x = ConvNorm(32, 3, 1, self.norm, nn.relu, dtype=self.dtype, name="stem2")(x)
        x = ConvNorm(64, 3, 1, self.norm, nn.relu, dtype=self.dtype, name="stem3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outputs: Dict[str, Array] = {}
        num_blocks = _BLOCKS[self.depth]
        out_ch = self.res2_out_channels
        w = self.width
        for stage_idx, n in enumerate(num_blocks):
            name = f"res{stage_idx + 2}"
            stride = 1 if stage_idx == 0 else 2
            for i in range(n):
                x = Bottle2neck(
                    out_ch,
                    w * self.scale,
                    stride=stride if i == 0 else 1,
                    scale=self.scale,
                    norm=self.norm,
                    dtype=self.dtype,
                    name=f"{name}_block{i}",
                )(x)
            if name in self.out_features:
                outputs[name] = x
            out_ch *= 2
            w *= 2
        return outputs
