"""Positional encoding modules (FlowFormer).

Equivalents of `/root/reference/core/models/ff-flowformer/FF_FlowFormer_Core/
position_encoding.py:7-93`: module forms of the sine encodings plus a learned
embedding. The functional `LinearPositionEmbeddingSine` /
`ExpPositionEmbeddingSine` live in `nn/latent_cost.py`.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


class PositionEncodingSine(nn.Module):
    """Standard 2D sine position encoding over an NHWC feature map."""

    d_model: int = 256
    max_shape: tuple = (256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        d = self.d_model
        y_pos = jnp.arange(h, dtype=jnp.float32)[:, None]
        x_pos = jnp.arange(w, dtype=jnp.float32)[None, :]
        div = jnp.exp(jnp.arange(0, d // 2, 2, dtype=jnp.float32)
                      * (-math.log(10000.0) / (d // 2)))
        pe = jnp.zeros((h, w, d), jnp.float32)
        pe = pe.at[:, :, 0::4].set(jnp.sin(x_pos[..., None] * div))
        pe = pe.at[:, :, 1::4].set(jnp.cos(x_pos[..., None] * div))
        pe = pe.at[:, :, 2::4].set(jnp.sin(y_pos[..., None] * div))
        pe = pe.at[:, :, 3::4].set(jnp.cos(y_pos[..., None] * div))
        return x + pe[None].astype(self.dtype)


class LinearPositionEncoding(nn.Module):
    """Linear-frequency sine encoding added to an NHWC map (`:44-71`)."""

    d_model: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .latent_cost import linear_position_embedding_sine
        from ..ops.coords import coords_grid

        b, h, w, c = x.shape
        coords = coords_grid(1, h, w)  # (1, H, W, 2)
        enc = linear_position_embedding_sine(coords, dim=c)
        return x + enc.astype(self.dtype)


class LearnedPositionEncoding(nn.Module):
    """Learned per-row/column embeddings (`:74-93`)."""

    d_model: int = 256
    max_size: int = 320
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (self.max_size, c // 2), jnp.float32)
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (self.max_size, c // 2), jnp.float32)
        pe = jnp.concatenate([
            jnp.broadcast_to(col[None, :w, :], (h, w, c // 2)),
            jnp.broadcast_to(row[:h, None, :], (h, w, c // 2)),
        ], axis=-1)
        return x + pe[None].astype(self.dtype)
