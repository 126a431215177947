"""Condition Control Encoder (CCE) — the paper's core contribution.

NHWC/flax redesign of `BasicParallelFusionLayer`
(`/root/reference/core/models/ff-raft/FF_RAFT_Core/parallel_fusion.py:153-274`):
a BasicEncoder-shaped image branch plus a mirror mask branch, with a
bidirectional FusionUnit after every stage (fusion1..4) and a final
uni-directional fusion at the output (fusion5). Both branches run stride-8;
XLA fuses each fusion unit into the adjacent stages.

`copy_to_branch` / image-branch freezing are handled at the parameter level
in `train/surgery.py` rather than with in-module mutation.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blocks import ResidualBlock, TiledInputConv, conv2d, _stem
from .fusion_units import FusionUnit
from .norm import Norm


class BasicParallelFusionLayer(nn.Module):
    img_channel: int = 3
    mask_channel: int = 3
    output_dim: int = 128
    norm_fn: str = "batch"
    dropout: float = 0.0
    fusion_type: str = "1x1conv"
    freeze_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        ura = (not train) or self.freeze_bn
        ev = not train
        ft = self.fusion_type

        stem = _stem(d)
        if mask.shape[-1] == 1 and self.mask_channel != 1:
            # single-channel stand-in for a tiled mask: fold the tile into
            # the stem kernel (exact by linearity; see TiledInputConv)
            mask = TiledInputConv(64, self.mask_channel,
                                  name="mask_conv1", dtype=d)(mask)
        else:
            mask = stem(64, self.mask_channel, "mask_conv1")(mask)
        mask = Norm(self.norm_fn, 64, 8, name="mask_norm1", dtype=d)(mask, ura, fuse_relu=True, is_eval=ev)

        x = stem(64, self.img_channel, "conv1")(x)
        x = Norm(self.norm_fn, 64, 8, name="norm1", dtype=d)(x, ura, fuse_relu=True, is_eval=ev)

        mask, x = FusionUnit(64, ft, True, name="fusion1", dtype=d)(mask, x)

        dims = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
        for li, (cin, cout, stride) in enumerate(dims, start=1):
            mask = ResidualBlock(cin, cout, self.norm_fn, stride, name=f"mask_layer{li}_0", dtype=d)(mask, ura, is_eval=ev)
            mask = ResidualBlock(cout, cout, self.norm_fn, 1, name=f"mask_layer{li}_1", dtype=d)(mask, ura, is_eval=ev)
            x = ResidualBlock(cin, cout, self.norm_fn, stride, name=f"layer{li}_0", dtype=d)(x, ura, is_eval=ev)
            x = ResidualBlock(cout, cout, self.norm_fn, 1, name=f"layer{li}_1", dtype=d)(x, ura, is_eval=ev)
            mask, x = FusionUnit(cout, ft, True, name=f"fusion{li + 1}", dtype=d)(mask, x)

        mask = conv2d(self.output_dim, 1, 1, 0, name="mask_conv2", dtype=d, in_features=128)(mask)
        x = conv2d(self.output_dim, 1, 1, 0, name="conv2", dtype=d, in_features=128)(x)

        mask, x = FusionUnit(self.output_dim, ft, False, name="fusion5", dtype=d)(mask, x)

        if train and self.dropout > 0:
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2), deterministic=False)(x)
        return x
