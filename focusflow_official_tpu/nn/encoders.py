"""Stride-8 feature encoders (NHWC).

Equivalents of the reference BasicEncoder / SmallEncoder / ChannelProject
(`/root/reference/core/models/ff-raft/FF_RAFT_Core/extractor.py:118-267`,
`raft.py:25-37`). Dropout is spatial (drops whole channels), matching
torch `nn.Dropout2d`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blocks import BottleneckBlock, ResidualBlock, conv2d, _stem
from .norm import Norm
from ..ops.coords import resize_bilinear


class BasicEncoder(nn.Module):
    in_channel: int = 3
    output_dim: int = 128
    norm_fn: str = "batch"
    dropout: float = 0.0
    freeze_bn: bool = False  # BatchNorm eval-mode during training (`train.py:192-193`)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        ura = (not train) or self.freeze_bn  # use_running_average for batch norms
        ev = not train  # the actual eval flag (gates Pallas IN lowering; ADVICE r2)
        x = _stem(d)(64, self.in_channel, "conv1")(x)
        x = Norm(self.norm_fn, 64, 8, name="norm1", dtype=d)(x, ura, fuse_relu=True, is_eval=ev)

        dims = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
        for li, (cin, cout, stride) in enumerate(dims, start=1):
            x = ResidualBlock(cin, cout, self.norm_fn, stride, name=f"layer{li}_0", dtype=d)(x, ura, is_eval=ev)
            x = ResidualBlock(cout, cout, self.norm_fn, 1, name=f"layer{li}_1", dtype=d)(x, ura, is_eval=ev)

        x = conv2d(self.output_dim, 1, 1, 0, name="conv2", dtype=d, in_features=128)(x)

        if train and self.dropout > 0:
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2), deterministic=False)(x)
        return x


class SmallEncoder(nn.Module):
    in_channels: int = 3
    output_dim: int = 128
    norm_fn: str = "batch"
    dropout: float = 0.0
    freeze_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        ura = (not train) or self.freeze_bn
        ev = not train
        x = _stem(d)(32, self.in_channels, "conv1")(x)
        x = Norm(self.norm_fn, 32, 8, name="norm1", dtype=d)(x, ura, fuse_relu=True, is_eval=ev)

        dims = [(32, 32, 1), (32, 64, 2), (64, 96, 2)]
        for li, (cin, cout, stride) in enumerate(dims, start=1):
            x = BottleneckBlock(cin, cout, self.norm_fn, stride, name=f"layer{li}_0", dtype=d)(x, ura, is_eval=ev)
            x = BottleneckBlock(cout, cout, self.norm_fn, 1, name=f"layer{li}_1", dtype=d)(x, ura, is_eval=ev)

        x = conv2d(self.output_dim, 1, 1, 0, name="conv2", dtype=d, in_features=96)(x)

        if train and self.dropout > 0:
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2), deterministic=False)(x)
        return x


class ChannelProject(nn.Module):
    """1x1 projection after 8x bilinear downsample (`raft.py:25-37`)."""

    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        _, h, w, _ = x.shape
        x = resize_bilinear(x, (h // 8, w // 8))
        return conv2d(self.out_channels, 1, 1, 0, name="conv1", dtype=self.dtype, in_features=self.in_channels)(x)
