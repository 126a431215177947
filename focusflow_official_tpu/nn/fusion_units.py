"""Condition-fusion units for the Condition Control Encoder (NHWC).

The five interchangeable mask<->image fusion ops of the reference
(`/root/reference/core/models/ff-raft/FF_RAFT_Core/parallel_fusion.py:14-150`):
Conv1x1 (residual add), Concat (1x1 merge), SA (spatial attention), CA
(channel attention), each wrapped bi- or uni-directionally by `FusionUnit`.
All are elementwise/1x1/3x3 conv compositions that XLA fuses into the
surrounding encoder stages.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blocks import conv2d


class CA(nn.Module):
    """Channel attention: c_map(avgpool(q1)) + c_map(maxpool(q1)) gates v."""

    in_channels: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        c, d = self.in_channels, self.dtype
        q1 = conv2d(c, 3, 1, 1, name="conv_q", dtype=d, in_features=2 * c)(
            jnp.concatenate([q, v], axis=-1)
        )
        v = conv2d(c, 3, 1, 1, name="conv_v_0", dtype=d, in_features=c)(v)
        q_avg = q1.mean(axis=(1, 2), keepdims=True)
        q_max = q1.max(axis=(1, 2), keepdims=True)

        cm0 = conv2d(c // self.reduction, 1, 1, 0, name="c_map_0", dtype=d, in_features=c)
        cm2 = conv2d(c, 1, 1, 0, name="c_map_2", dtype=d, in_features=c // self.reduction)

        def c_map(t):
            return nn.sigmoid(cm2(nn.relu(cm0(t))))

        gate = c_map(q_avg) + c_map(q_max)
        return gate * v + q


class SA(nn.Module):
    """Spatial attention: sigmoid(conv(mean||max of q1)) gates v."""

    in_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        c, d = self.in_channels, self.dtype
        q1 = conv2d(c, 3, 1, 1, use_bias=False, name="conv_q", dtype=d)(
            jnp.concatenate([q, v], axis=-1)
        )
        v = conv2d(c, 3, 1, 1, use_bias=False, name="conv_v_0", dtype=d)(v)
        q_mean = q1.mean(axis=-1, keepdims=True)
        q_max = q1.max(axis=-1, keepdims=True)
        s = conv2d(1, 3, 1, 1, use_bias=False, name="s_map_0", dtype=d)(
            jnp.concatenate([q_mean, q_max], axis=-1)
        )
        return nn.sigmoid(s) * v + q


class Concat(nn.Module):
    in_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        c, d = self.in_channels, self.dtype
        return conv2d(c, 1, 1, 0, name="conv", dtype=d, in_features=2 * c)(
            jnp.concatenate([q, v], axis=-1)
        )


class Conv1x1(nn.Module):
    in_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        c, d = self.in_channels, self.dtype
        return q + conv2d(c, 1, 1, 0, name="conv", dtype=d, in_features=c)(v)


_FUSION_OPS = {"1x1conv": Conv1x1, "concat": Concat, "SA": SA, "CA": CA}


class FusionUnit(nn.Module):
    """Bidirectional (or mask->img only) fusion between the two branches.

    Returns (mask_out, img_out), matching reference `FusionUnit.forward`
    (`parallel_fusion.py:142-150`). fusion_type '1x1conv-unidirection'
    forces uni-direction regardless of `bi_direction`.
    """

    in_channels: int
    fusion_type: str = "1x1conv"
    bi_direction: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mask: jnp.ndarray, img: jnp.ndarray):
        ftype = self.fusion_type
        bi = self.bi_direction
        if ftype == "1x1conv-unidirection":
            ftype, bi = "1x1conv", False
        if ftype not in _FUSION_OPS:
            raise ValueError(f"Fusion type {self.fusion_type} not supported.")
        op = _FUSION_OPS[ftype]

        img_out = op(self.in_channels, name="mask2img", dtype=self.dtype)(img, mask)
        if bi:
            mask_out = op(self.in_channels, name="img2mask", dtype=self.dtype)(mask, img)
        else:
            mask_out = mask
        return mask_out, img_out
