"""Mask-image channelwise mutual-attention transformer (NHWC).

Equivalent of `/root/reference/core/models/ff-raft/FF_RAFT_Core/attention.py`:
channel-attention (Restormer-style) where q comes from the mask branch and
k/v from the image branch, with per-head learnable temperature; LayerNorm
variants normalize over the channel axis per spatial position.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import conv2d
from .twins import gelu


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis (WithBias / BiasFree variants),
    eps 1e-5, biased variance — `attention.py:16-61`."""

    dim: int
    bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        var = xf.var(axis=-1, keepdims=True)
        if self.bias:
            bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
            mu = xf.mean(axis=-1, keepdims=True)
            out = (xf - mu) / jnp.sqrt(var + 1e-5) * scale + bias
        else:
            out = xf / jnp.sqrt(var + 1e-5) * scale
        return out.astype(self.dtype)


class MutualAttention(nn.Module):
    """Channelwise cross-attention: q(mask) attends over k/v(image)
    (`attention.py:64-97`). Channels are the tokens; the (h*w) axis is the
    feature axis that gets L2-normalized."""

    dim: int
    num_heads: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        nh = self.num_heads
        ch = c // nh
        d = self.dtype

        temperature = self.param("temperature", nn.initializers.ones, (nh, 1, 1), jnp.float32)

        q = conv2d(c, 1, 1, 0, use_bias=self.use_bias, name="q", dtype=d)(x)
        k = conv2d(c, 1, 1, 0, use_bias=self.use_bias, name="k", dtype=d)(y)
        v = conv2d(c, 1, 1, 0, use_bias=self.use_bias, name="v", dtype=d)(y)

        def heads(t):  # (B, H, W, C) -> (B, nh, ch, H*W)
            return t.reshape(b, h * w, nh, ch).transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)

        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k,
                          precision=jax.lax.Precision.HIGHEST) * temperature
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v,
                         precision=jax.lax.Precision.HIGHEST)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c).astype(d)
        return conv2d(c, 1, 1, 0, use_bias=self.use_bias, name="project_out", dtype=d)(out)


class Mlp(nn.Module):
    in_features: int
    hidden_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_features, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = gelu(x)
        return nn.Dense(self.in_features, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(x)


class MaskImageChannelAttentionTransformerBlock(nn.Module):
    """`MaskImage_ChannelAttentionTransformerBlock` (`attention.py:119-143`)."""

    dim: int
    num_heads: int
    ffn_expansion_factor: int = 2
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mask: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        fused = image + MutualAttention(self.dim, self.num_heads, self.use_bias,
                                        name="attn", dtype=d)(
            ChannelLayerNorm(self.dim, name="norm1_mask_body", dtype=d)(mask),
            ChannelLayerNorm(self.dim, name="norm1_image_body", dtype=d)(image),
        )
        normed = nn.LayerNorm(epsilon=1e-5, dtype=d, param_dtype=jnp.float32,
                              name="norm2")(fused)
        fused = fused + Mlp(self.dim, int(self.dim * self.ffn_expansion_factor),
                            name="ffn", dtype=d)(normed)
        return fused
