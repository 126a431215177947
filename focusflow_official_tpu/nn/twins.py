"""Twins-SVT backbone (2-stage truncation) + CCE variant (flax, token layout).

The reference consumes timm's `twins_svt_large` truncated to its first two
stages (`/root/reference/core/models/ff-flowformer/FF_FlowFormer_Core/
FlowFormer/encoders.py:6-36`): patch-embed 4x4 -> stage1 (dim 128, heads 4,
depth 2: LSA(ws 7) then GSA(sr 8), PEG after the first block) ->
patch-embed 2x2 -> stage2 (dim 256, heads 8, depth 2: LSA(ws 7), GSA(sr 4))
producing a stride-8, 256-channel feature map. The CCE variant
(`encoders.py:131-174`) mirrors the whole pyramid for the mask and fuses
with 1x1conv units after each stage (bi at 128, uni at 256).

Architecture follows the public Twins paper/timm config
(embed_dims 128/256, mlp_ratio 4, LayerNorm eps 1e-6); ImageNet-pretrained
timm weights can be imported with `compat.torch_import` once a checkpoint
file is provided (not fetchable in this environment).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

HIGH = jax.lax.Precision.HIGHEST


def gelu(x):
    """GELU for the FlowFormer stack, precision-keyed by compute dtype.

    The reference's torch `nn.GELU()` (timm Twins / LatentCostFormer MLPs)
    is exact erf, and the f32 path keeps it — that's what the parity suites
    compare. The bf16 fast path defaults to the tanh approximation: the
    twins towers are VPU-transcendental-bound on exact erf (~29M elems/MLP)
    and the tanh form measured **18.41 -> 21.10 fps** at the FlowFormer
    bench protocol (BENCH.md round 4); its ~1e-3-relative activation delta
    is BELOW the ~4e-3 bf16 rounding that path already accepts, and the
    trained-weight gate (`test_bf16_fast_path_trained`) bounds the combined
    budget. FF_FAST_GELU=1/0 forces the choice either way."""
    import os

    forced = os.environ.get("FF_FAST_GELU")
    if forced is not None:
        approx = forced != "0"
    else:
        approx = x.dtype == jnp.bfloat16
    return nn.gelu(x, approximate=approx)


def _dense(features, name, dtype, use_bias=True):
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, precision=HIGH, name=name)


def _ln(name, dtype, eps=1e-6):
    return nn.LayerNorm(epsilon=eps, dtype=dtype, param_dtype=jnp.float32, name=name)


class TwinsMlp(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _dense(self.hidden, "fc1", self.dtype)(x)
        x = gelu(x)
        return _dense(self.dim, "fc2", self.dtype)(x)


def _window_partition(x, ws):
    """(B, H, W, C) -> (B, h, w, ws*ws, C) with zero pad to ws multiples."""
    b, h, w, c = x.shape
    pad_b = (ws - h % ws) % ws
    pad_r = (ws - w % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (hp // ws) * (wp // ws), ws * ws, c), (hp, wp)


def _window_merge(x, hp, wp, ws, h, w):
    """(B, nwin, ws*ws, C) -> (B, H, W, C), crop the pad."""
    b = x.shape[0]
    c = x.shape[-1]
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hp, wp, c)
    return x[:, :h, :w]


class LocallyGroupedAttn(nn.Module):
    """LSA: full attention within ws x ws windows (timm Twins style)."""

    dim: int
    num_heads: int
    ws: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size: Tuple[int, int]):
        b, n, c = x.shape
        h, w = size
        nh = self.num_heads
        hd = c // nh
        scale = hd**-0.5

        # (An FF_LSA_V2 transpose-minimal variant — one stacked qkv window
        # partition instead of per-tensor ones — measured 16.56 vs 18.41 fps
        # at the FlowFormer bench and was deleted; BENCH.md round 4.)
        xw, (hp, wp) = _window_partition(x.reshape(b, h, w, c), self.ws)
        qkv = _dense(3 * c, "qkv", self.dtype)(xw)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (B, nwin, T, C) -> (B, nwin, nh, T, hd)
            bb, nw, t_, _ = t.shape
            return t.reshape(bb, nw, t_, nh, hd).transpose(0, 1, 3, 2, 4)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bwhid,bwhjd->bwhij", q, k, precision=HIGH) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bwhij,bwhjd->bwhid", attn, v, precision=HIGH)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, -1, self.ws * self.ws, c)
        out = _window_merge(out, hp, wp, self.ws, h, w).reshape(b, n, c)
        return _dense(c, "proj", self.dtype)(out)


class GlobalSubSampleAttn(nn.Module):
    """GSA: queries attend to sr_ratio-subsampled keys/values (timm style)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size: Tuple[int, int]):
        b, n, c = x.shape
        h, w = size
        nh = self.num_heads
        hd = c // nh
        scale = hd**-0.5

        q = _dense(c, "q", self.dtype)(x)

        if self.sr_ratio > 1:
            sr = self.sr_ratio
            xs = x.reshape(b, h, w, c)
            xs = nn.Conv(c, (sr, sr), strides=(sr, sr), dtype=self.dtype,
                         param_dtype=jnp.float32, precision=HIGH, name="sr")(xs)
            xs = xs.reshape(b, -1, c)
            xs = _ln("norm", self.dtype)(xs)
        else:
            xs = x
        kv = _dense(2 * c, "kv", self.dtype)(xs)
        k, v = jnp.split(kv, 2, axis=-1)

        # NOTE: the fused small-kv attention kernel was measured HERE and
        # REJECTED (BENCH.md round 3): a Mosaic custom call inside the twins
        # towers pins layouts around the full-res patch-embed/PEG convs and
        # LN reduces, tripling the tower cost (context tower 4.6 -> 14.3 ms)
        # for a ~1 ms attention win. XLA keeps the whole tower fused.
        from ..kernels.attention import _xla_attention

        out = _xla_attention(q, k, v, nh, scale)
        return _dense(c, "proj", self.dtype)(out)


class TwinsBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    ws: Optional[int] = None  # None/1 -> GSA, >1 -> LSA
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size):
        if self.ws is not None and self.ws > 1:
            attn = LocallyGroupedAttn(self.dim, self.num_heads, self.ws,
                                      name="attn", dtype=self.dtype)
        else:
            attn = GlobalSubSampleAttn(self.dim, self.num_heads, self.sr_ratio,
                                       name="attn", dtype=self.dtype)
        x = x + attn(_ln("norm1", self.dtype)(x), size)
        x = x + TwinsMlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp",
                         dtype=self.dtype)(_ln("norm2", self.dtype)(x))
        return x


class PosConv(nn.Module):
    """PEG: depthwise 3x3 conv positional encoding (`twins.py:791-808`)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size):
        b, n, c = x.shape
        h, w = size
        feat = x.reshape(b, h, w, c)
        y = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                    dtype=self.dtype, param_dtype=jnp.float32, precision=HIGH,
                    name="proj_0")(feat)
        return (y + feat).reshape(b, n, c)


class TwinsPatchEmbed(nn.Module):
    """Conv patch embedding + LayerNorm (`twins.py:811-836`)."""

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC image/feature
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    param_dtype=jnp.float32, precision=HIGH, name="proj")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        return _ln("norm", self.dtype)(x), (h, w)


_STAGE_DIMS = (128, 256)
_STAGE_HEADS = (4, 8)
_STAGE_SR = (8, 4)
_STAGE_PATCH = (4, 2)
_STAGE_DEPTH = (2, 2)
_WS = 7


class TwinsSVT2Stage(nn.Module):
    """twins_svt_large truncated to 2 stages -> (B, H/8, W/8, 256) NHWC.

    Mirrors the reference truncation + forward (`encoders.py:6-36`): per
    stage, patch embed -> blocks (LSA, GSA alternating; PEG after block 0).
    """

    in_chans: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) NHWC
        for s in range(2):
            dim = _STAGE_DIMS[s]
            x, size = TwinsPatchEmbed(_STAGE_PATCH[s], dim,
                                      name=f"patch_embeds_{s}", dtype=self.dtype)(x)
            for j in range(_STAGE_DEPTH[s]):
                ws = _WS if j % 2 == 0 else 1
                x = TwinsBlock(dim, _STAGE_HEADS[s], 4.0, _STAGE_SR[s], ws,
                               name=f"blocks_{s}_{j}", dtype=self.dtype)(x, size)
                if j == 0:
                    x = PosConv(dim, name=f"pos_block_{s}", dtype=self.dtype)(x, size)
            b = x.shape[0]
            x = x.reshape(b, size[0], size[1], dim)
        return x  # (B, H/8, W/8, 256)


class TwinsSVT2StageCCE(nn.Module):
    """CCE twins: mirrored mask pyramid + 1x1conv fusion per stage
    (`encoders.py:131-174`; fusion bi at stage1/128ch, uni at stage2/256ch).
    Fusion happens on the NHWC feature maps after each stage, matching the
    reference's reshape-before-fuse ordering."""

    in_chans: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        from .fusion_units import FusionUnit

        for s in range(2):
            dim = _STAGE_DIMS[s]
            x, size = TwinsPatchEmbed(_STAGE_PATCH[s], dim,
                                      name=f"patch_embeds_{s}", dtype=self.dtype)(x)
            mask, msize = TwinsPatchEmbed(_STAGE_PATCH[s], dim,
                                          name=f"mask_patch_embeds_{s}", dtype=self.dtype)(mask)
            for j in range(_STAGE_DEPTH[s]):
                ws = _WS if j % 2 == 0 else 1
                x = TwinsBlock(dim, _STAGE_HEADS[s], 4.0, _STAGE_SR[s], ws,
                               name=f"blocks_{s}_{j}", dtype=self.dtype)(x, size)
                mask = TwinsBlock(dim, _STAGE_HEADS[s], 4.0, _STAGE_SR[s], ws,
                                  name=f"mask_blocks_{s}_{j}", dtype=self.dtype)(mask, msize)
                if j == 0:
                    x = PosConv(dim, name=f"pos_block_{s}", dtype=self.dtype)(x, size)
                    mask = PosConv(dim, name=f"mask_pos_block_{s}", dtype=self.dtype)(mask, msize)
            b = x.shape[0]
            x = x.reshape(b, size[0], size[1], dim)
            mask = mask.reshape(b, msize[0], msize[1], dim)
            mask, x = FusionUnit(dim, "1x1conv", s == 0,
                                 name=f"fusion_blks_{s}", dtype=self.dtype)(mask, x)
        return x
