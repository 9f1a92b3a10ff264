"""DLA-34 (deep layer aggregation) backbone, NHWC flax.

Counterpart of CenterNet2's vendored ``centernet/modeling/backbone/dla.py``
/ ``dlafpn.py`` (DLA-34 with hierarchical tree aggregation, used by the
CenterNet2 realtime configs). Basic residual blocks; Tree nodes aggregate
children through 1x1 root convs.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ..layers import ConvNorm


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, residual: Array | None = None) -> Array:
        if residual is None:
            residual = x
        out = ConvNorm(self.channels, 3, self.stride, self.norm, nn.relu, dtype=self.dtype, name="conv1")(x)
        out = ConvNorm(self.channels, 3, 1, self.norm, None, dtype=self.dtype, name="conv2")(out)
        if residual.shape != out.shape:
            residual = ConvNorm(self.channels, 1, self.stride, self.norm, None, dtype=self.dtype, name="project")(residual)
        return nn.relu(out + residual)


class Root(nn.Module):
    channels: int
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[Array]) -> Array:
        x = jnp.concatenate(xs, axis=-1)
        x = ConvNorm(self.channels, 1, 1, self.norm, None, dtype=self.dtype, name="conv")(x)
        return nn.relu(x)


class Tree(nn.Module):
    levels: int
    channels: int
    stride: int = 1
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, residual: Array | None = None) -> Array:
        if self.levels == 1:
            b1 = BasicBlock(self.channels, self.stride, self.norm, self.dtype, name="tree1")(x, residual)
            b2 = BasicBlock(self.channels, 1, self.norm, self.dtype, name="tree2")(b1)
            return Root(self.channels, self.norm, self.dtype, name="root")([b2, b1])
        t1 = Tree(self.levels - 1, self.channels, self.stride, self.norm, self.dtype, name="tree1")(x)
        t2 = Tree(self.levels - 1, self.channels, 1, self.norm, self.dtype, name="tree2")(t1)
        return t2


class DLA34(nn.Module):
    """DLA-34: channels (16, 32, 64, 128, 256, 512), levels (1,1,1,2,2,1).
    Emits dla3..dla5 (strides 8/16/32) for the FPN builders."""

    norm: str = "BN"
    out_features: Sequence[str] = ("dla3", "dla4", "dla5")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        chans = (16, 32, 64, 128, 256, 512)
        x = ConvNorm(chans[0], 7, 1, self.norm, nn.relu, dtype=self.dtype, name="base")(x)
        x = ConvNorm(chans[0], 3, 1, self.norm, nn.relu, dtype=self.dtype, name="level0")(x)
        x = ConvNorm(chans[1], 3, 2, self.norm, nn.relu, dtype=self.dtype, name="level1")(x)
        outs: Dict[str, Array] = {}
        for i, (ch, lv) in enumerate(zip(chans[2:], (1, 2, 2, 1))):
            x = Tree(lv, ch, stride=2, norm=self.norm, dtype=self.dtype, name=f"level{i + 2}")(x)
            name = f"dla{i + 2}"
            if name in self.out_features:
                outs[name] = x
        return outs


class DeformNode(nn.Module):
    """DCN aggregation node (dlafpn.py:278-300 DeformConv): a plain conv
    predicts 3x3 offsets+mask (zero-init so it starts as an ordinary conv),
    then a modulated deformable conv + norm + relu."""

    channels: int
    norm: str = "FrozenBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ...ops.deform_conv import deform_conv2d
        from ..layers import get_norm

        off_mask = nn.Conv(
            27, (3, 3), padding=1,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="offset",
        )(x)
        # reference channel layout: (offset_x, offset_y, mask) thirds;
        # deform_conv2d wants (dy, dx) interleaved per tap
        off_x, off_y, mask = jnp.split(off_mask.astype(jnp.float32), 3, axis=-1)
        offset = jnp.stack([off_y, off_x], axis=-1).reshape(*off_x.shape[:-1], 18)
        mask = jax.nn.sigmoid(mask)
        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (3, 3, x.shape[-1], self.channels),
        )
        y = deform_conv2d(
            x.astype(jnp.float32), offset, kernel.astype(jnp.float32),
            mask=mask, stride=1, padding=1,
        ).astype(self.dtype)
        norm = get_norm(self.norm, self.channels)
        if norm is not None:
            y = norm(y)
        return nn.relu(y)


class IDAUp(nn.Module):
    """Iterative deep aggregation (dlafpn.py IDAUp): project each finer
    level to `channels`, 2x-upsample, fuse with the previous level through a
    node (conv or dcn)."""

    channels: int
    node_type: str = "conv"  # 'conv' | 'dcn'
    norm: str = "FrozenBN"
    dtype: Any = jnp.float32

    def _node(self, name):
        if self.node_type == "dcn":
            return DeformNode(self.channels, self.norm, self.dtype, name=name)
        return ConvNorm(self.channels, 3, 1, self.norm, nn.relu, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, layers: Sequence[Array]) -> Array:
        """layers: coarse→fine? No — fine→coarse list [l0 (finest) ... ];
        returns the aggregated finest-resolution map (upsampling each
        coarser level into the previous one, dlafpn.py:320-327)."""
        out = self._node("proj_0")(layers[0])
        for i, l in enumerate(layers[1:], start=1):
            proj = self._node(f"proj_{i}")(l)
            b, h, w, c = proj.shape
            up = jax.image.resize(proj, (b, 2 ** i * h, 2 ** i * w, c), "bilinear")
            up = up[:, : out.shape[1], : out.shape[2]]
            out = self._node(f"node_{i}")(up + out)
        return out


class DLAUp(nn.Module):
    """Top-down aggregation over the DLA stage outputs with optional DCN
    nodes (DLAUP_NODE_MAP 'conv'/'dcn', dlafpn.py:332-335)."""

    out_channels: int = 64
    node_type: str = "conv"
    norm: str = "FrozenBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, Array]) -> Dict[str, Array]:
        names = sorted(features)  # dla2..dla5 fine→coarse
        layers = [features[n] for n in names]
        fused = IDAUp(
            self.out_channels, self.node_type, self.norm, self.dtype, name="ida"
        )(layers)
        return {"dlaup": fused, **features}
