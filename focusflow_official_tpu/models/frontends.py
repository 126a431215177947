"""Alternative CCE front-ends: 'attention' (UNet + channel-attn transformer)
and 'conv' (small UNet over cat(img, mask)).

Equivalents of `/root/reference/core/models/ff-raft/FF_RAFT_Core/fusion.py`
(`FusionLayer`, the MPRNet-style UNet with per-level mask transformer fusion
and SAM output head) and `conv_fusion.py` (`ConvFusionLayer`,
`ConvPromptLayer`). These predate the parallel CCE and are selected by
MODEL.FUSION in {'attention','conv'}; RAFT then runs with
in_channels=FUSION_CHANNEL and `load_raft(flag='backend')` conv1 surgery.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.attention import MaskImageChannelAttentionTransformerBlock
from ..nn.blocks import conv2d
from ..nn.norm import Norm


def _lrelu(x, slope=0.2):
    return nn.leaky_relu(x, negative_slope=slope)


def ConvTranspose2x(features: int, name: str | None = None, use_bias: bool = True,
                    dtype=jnp.float32) -> nn.ConvTranspose:
    """torch ConvTranspose2d(k=2, s=2, p=0) equivalent (exact 2x upsample).

    flax ConvTranspose pad = k - 1 - torch_pad (empirically verified for the
    k4/s2/p1 case in nn/blocks.py): k2/s2/p0 -> ((1,1),(1,1)).
    """
    import jax

    return nn.ConvTranspose(
        features, (2, 2), strides=(2, 2), padding=((1, 1), (1, 1)),
        transpose_kernel=True, use_bias=use_bias,
        dtype=dtype, param_dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST, name=name,
    )


class SAM(nn.Module):
    """Supervised attention module (`fusion.py:21-34`)."""

    n_feat: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_img):
        d = self.dtype
        x1 = conv2d(self.n_feat, 3, 1, 1, name="conv1", dtype=d)(x)
        img = conv2d(3, 3, 1, 1, name="conv2", dtype=d)(x) + x_img
        x2 = nn.sigmoid(conv2d(self.n_feat, 3, 1, 1, name="conv3", dtype=d)(img))
        return x1 * x2 + x, img


class UNetConvBlock(nn.Module):
    """`fusion.py:37-96` (the used path: no emgc, merge_before_downsample)."""

    in_ch: int
    out_ch: int
    downsample: bool
    relu_slope: float = 0.2
    num_heads: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_filter=None):
        d = self.dtype
        out = conv2d(self.out_ch, 3, 1, 1, name="conv_1", dtype=d)(x)
        out = _lrelu(out, self.relu_slope)
        out = _lrelu(conv2d(self.out_ch, 3, 1, 1, name="conv_2", dtype=d)(out),
                     self.relu_slope)
        out = out + conv2d(self.out_ch, 1, 1, 0, name="identity", dtype=d)(x)

        if mask_filter is not None:
            # reference quirk (`fusion.py:82`): the call site passes the image
            # features as the transformer's "mask" argument and vice versa, so
            # q comes from the image branch and k/v from the mask branch
            out = MaskImageChannelAttentionTransformerBlock(
                self.out_ch, self.num_heads, 4, False,
                name="image_event_transformer", dtype=d,
            )(out, mask_filter)

        if self.downsample:
            down = conv2d(self.out_ch, 4, 2, 1, use_bias=False,
                          name="downsample", dtype=d)(out)
            return down, out
        return out


class UNetMaskConvBlock(nn.Module):
    """`fusion.py:99-143`."""

    in_ch: int
    out_ch: int
    downsample: bool
    relu_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        out = conv2d(self.out_ch, 3, 1, 1, name="conv_1", dtype=d)(x)
        out = _lrelu(out, self.relu_slope)
        out = _lrelu(conv2d(self.out_ch, 3, 1, 1, name="conv_2", dtype=d)(out),
                     self.relu_slope)
        out = out + conv2d(self.out_ch, 1, 1, 0, name="identity", dtype=d)(x)

        if self.downsample:
            down = conv2d(self.out_ch, 4, 2, 1, use_bias=False,
                          name="downsample", dtype=d)(out)
            out = conv2d(self.out_ch, 1, 1, 0, name="conv_before_merge", dtype=d)(out)
            return down, out
        return conv2d(self.out_ch, 1, 1, 0, name="conv_before_merge", dtype=d)(out)


class UNetUpBlock(nn.Module):
    """`fusion.py:146-157`."""

    in_ch: int
    out_ch: int
    relu_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bridge):
        up = ConvTranspose2x(self.out_ch, name="up", dtype=self.dtype)(x)
        out = jnp.concatenate([up, bridge], axis=-1)
        return UNetConvBlock(self.in_ch, self.out_ch, False, self.relu_slope,
                             name="conv_block", dtype=self.dtype)(out)


class FusionLayer(nn.Module):
    """'attention' front-end (`fusion.py:160-244`), depth 3, heads (1, 2, 4)."""

    img_channel: int = 3
    mask_channel: int = 3
    wf: int = 64
    depth: int = 3
    relu_slope: float = 0.2
    num_heads: Sequence[int] = (1, 2, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        d = self.dtype
        image = x

        # mask encoder
        m = jnp.concatenate([mask, x], axis=-1)
        m = conv2d(8, 1, 1, 0, name="conv_mask0", dtype=d)(m)
        m = conv2d(self.wf, 3, 1, 1, name="conv_mask1", dtype=d)(m)
        masks = []
        prev = self.wf
        for i in range(self.depth):
            down = (i + 1) < self.depth
            blk = UNetMaskConvBlock(prev, (2**i) * self.wf, down, self.relu_slope,
                                    name=f"down_path_mask_{i}", dtype=d)
            if down:
                m, m_up = blk(m)
                masks.append(m_up)
            else:
                m = blk(m)
                masks.append(m)
            prev = (2**i) * self.wf

        # image encoder with transformer fusion
        x1 = conv2d(self.wf, 3, 1, 1, name="conv_01", dtype=d)(image)
        encs = []
        prev = self.wf
        for i in range(self.depth):
            down = (i + 1) < self.depth
            blk = UNetConvBlock(prev, (2**i) * self.wf, down, self.relu_slope,
                                self.num_heads[i], name=f"down_path_1_{i}", dtype=d)
            if down:
                x1, x1_up = blk(x1, masks[i])
                encs.append(x1_up)
            else:
                x1 = blk(x1, masks[i])
            prev = (2**i) * self.wf

        # decoder with skip connections
        for j, i in enumerate(reversed(range(self.depth - 1))):
            bridge = conv2d((2**i) * self.wf, 3, 1, 1,
                            name=f"skip_conv_1_{j}", dtype=d)(encs[-j - 1])
            x1 = UNetUpBlock(prev, (2**i) * self.wf, self.relu_slope,
                             name=f"up_path_1_{j}", dtype=d)(x1, bridge)
            prev = (2**i) * self.wf

        sam_feature, _ = SAM(prev, name="sam12", dtype=d)(x1, image)
        return sam_feature


class _GNResBlock(nn.Module):
    """`conv_fusion.py:7-35`: group-norm residual block."""

    out_ch: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        d = self.dtype
        c = self.out_ch
        y = conv2d(c, 3, self.stride, 1, name="conv1", dtype=d)(x)
        y = Norm("group", c, c // 8, name="norm1", dtype=d)(y, use_running_average)
        y = nn.relu(y)
        y = conv2d(c, 3, 1, 1, name="conv2", dtype=d)(y)
        y = Norm("group", c, c // 8, name="norm2", dtype=d)(y, use_running_average)
        y = nn.relu(y)
        if self.stride != 1:
            x = conv2d(c, 1, self.stride, 0, name="downsample_conv", dtype=d)(x)
            x = Norm("group", c, c // 8, name="norm3", dtype=d)(x, use_running_average)
        return nn.relu(x + y)


class ConvEncoder(nn.Module):
    """`conv_fusion.py:5-77`: BN stem + 2 group-norm ResBlock stages."""

    out_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        ura = not train
        x = conv2d(32, 3, 1, 1, name="conv1", dtype=d)(x)
        x = Norm("batch", 32, name="norm1", dtype=d)(x, ura)
        x = nn.relu(x)

        x1 = _GNResBlock(64, 2, name="block1_0", dtype=d)(x, ura)
        x1 = _GNResBlock(64, 1, name="block1_1", dtype=d)(x1, ura)
        x2 = _GNResBlock(128, 2, name="block2_0", dtype=d)(x1, ura)
        x2 = _GNResBlock(128, 1, name="block2_1", dtype=d)(x2, ura)
        x3 = conv2d(self.out_channels, 1, 1, 0, name="conv2", dtype=d)(x2)
        return x3, [x, x1]


class _DecoderBlock(nn.Module):
    """`conv_fusion.py:82-98`."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, use_running_average: bool = True):
        d = self.dtype
        c = self.out_ch
        x1 = ConvTranspose2x(c, name="up", dtype=d)(x1)
        x1 = Norm("group", c, c // 8, name="norm1", dtype=d)(x1, use_running_average)
        x1 = nn.relu(x1)
        x1 = jnp.concatenate([x1, x2], axis=-1)
        x1 = conv2d(c, 3, 1, 1, name="conv", dtype=d)(x1)
        x1 = Norm("group", c, c // 8, name="norm2", dtype=d)(x1, use_running_average)
        return nn.relu(x1)


class ConvDecoder(nn.Module):
    """`conv_fusion.py:80-129`."""

    out_channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_list, train: bool = False):
        d = self.dtype
        ura = not train
        y1 = _DecoderBlock(64, name="decoder2", dtype=d)(x, x_list[-1], ura)
        y = _DecoderBlock(32, name="decoder1", dtype=d)(y1, x_list[-2], ura)
        return conv2d(self.out_channels, 1, 1, 0, name="conv", dtype=d)(y)


class ConvFusionLayer(nn.Module):
    """'conv' front-end (`conv_fusion.py:132-145`): UNet over cat(img, mask)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, mask, train: bool = False):
        x = jnp.concatenate([image, mask], axis=-1)
        x_down, x_list = ConvEncoder(128, name="encoder", dtype=self.dtype)(x, train)
        return ConvDecoder(self.out_channels, name="decoder", dtype=self.dtype)(
            x_down, x_list, train
        )


class ConvPromptLayer(nn.Module):
    """`conv_fusion.py:148-188`: small conv stack with BN + residual 1x1."""

    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        ura = not train
        y = nn.relu(conv2d(8, 3, 1, 1, name="conv_0", dtype=d)(x))
        y = conv2d(16, 5, 1, 2, name="conv_2", dtype=d)(y)
        y = nn.relu(Norm("batch", 16, name="conv_3", dtype=d)(y, ura))
        y = nn.relu(conv2d(8, 3, 1, 1, name="conv_5", dtype=d)(y))
        y = conv2d(4, 3, 1, 1, name="conv_7", dtype=d)(y)
        y = nn.relu(Norm("batch", 4, name="conv_8", dtype=d)(y, ura))
        y = conv2d(self.out_channels, 1, 1, 0, name="conv_10", dtype=d)(y)
        if self.in_channels != self.out_channels:
            x1 = conv2d(self.out_channels, 1, 1, 0, name="conv0_0", dtype=d)(x)
            x1 = Norm("batch", self.out_channels, name="conv0_1", dtype=d)(x1, ura)
            y = y + x1
        return y
