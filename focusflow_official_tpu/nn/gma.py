"""GMA (global motion aggregation) + FlowFormer update blocks (NHWC flax).

Equivalents of `/root/reference/core/models/ff-flowformer/FF_FlowFormer_Core/
FlowFormer/LatentCostFormer/{gma.py,gru.py}`: content-only GMA attention over
the context features, value aggregation with a learned gamma residual, and
the RAFT-style update blocks whose motion encoder consumes the concatenated
(global latent cost, 81-ch local cost) features.

The reference's GMA Attention constructs RelPosEmb embedding tables that its
forward never uses (`gma.py:62-75`); we declare them too so checkpoints map
1:1.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import conv2d, kaiming_out, torch_bias_init
from .twins import HIGH
from .update import FlowHead, SepConvGRU


class _Conv1x1MirrorParams(nn.Module):
    """Parameter-only mirror of `conv2d(cout, 1, 1, 0, name=..., in_features=
    fan_in)`: identical names/shapes/inits under the same module path, so
    checkpoints map 1:1 while the caller applies the kernel split (the
    decoder chunk-fold path). `bias_fan_in=None` mirrors the in_features-less
    form (zeros bias init)."""

    cin: int
    cout: int
    bias_fan_in: int | None = None

    @nn.compact
    def __call__(self):
        k = self.param("kernel", kaiming_out, (1, 1, self.cin, self.cout),
                       jnp.float32)
        if self.bias_fan_in is None:
            bias_init = nn.initializers.zeros
        else:
            fan = self.bias_fan_in

            def bias_init(key, shape, dtype=jnp.float32):
                return torch_bias_init(key, shape, dtype, fan)

        b = self.param("bias", bias_init, (self.cout,), jnp.float32)
        return k, b


class GMAAttention(nn.Module):
    """Content-only attention map over context features (`gma.py:34-76`)."""

    dim: int
    heads: int = 1
    dim_head: int = 128
    max_pos_size: int = 160
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fmap):  # (B, H, W, C) -> (B, heads, H*W, H*W)
        d = self.dtype
        b, h, w, _ = fmap.shape
        inner = self.heads * self.dim_head
        scale = self.dim_head**-0.5

        qk = conv2d(inner * 2, 1, 1, 0, use_bias=False, name="to_qk", dtype=d)(fmap)
        q, k = jnp.split(qk, 2, axis=-1)

        # unused-by-forward RelPosEmb tables, kept for checkpoint parity
        self.param("pos_emb_rel_height", nn.initializers.normal(1.0),
                   (2 * self.max_pos_size - 1, self.dim_head), jnp.float32)
        self.param("pos_emb_rel_width", nn.initializers.normal(1.0),
                   (2 * self.max_pos_size - 1, self.dim_head), jnp.float32)

        def heads_of(t):
            return t.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        qh = heads_of(q) * scale
        kh = heads_of(k)
        sim = jnp.einsum("bhid,bhjd->bhij", qh, kh, precision=HIGH)
        return jax.nn.softmax(sim, axis=-1)


class GMAAggregate(nn.Module):
    """Aggregate motion features with the attention map (`gma.py:79-115`)."""

    dim: int
    heads: int = 1
    dim_head: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, attn, fmap):  # attn (B,h,N,N), fmap (B,H,W,C)
        d = self.dtype
        b, h, w, c = fmap.shape
        inner = self.heads * self.dim_head

        v = conv2d(inner, 1, 1, 0, use_bias=False, name="to_v", dtype=d)(fmap)
        v = v.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v, precision=HIGH)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, inner)
        if inner != self.dim:
            out = conv2d(self.dim, 1, 1, 0, use_bias=False, name="project", dtype=d)(out)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return fmap + gamma * out


class FFBasicMotionEncoder(nn.Module):
    """Motion encoder with configurable cost planes (`gru.py:62-88`)."""

    cor_planes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        d = self.dtype
        if isinstance(corr, tuple):
            # decoder chunk-fold path (FF_DEC_CHUNK): corr arrives as
            # (cost_global NHWC, window chunk (B, Q, K, K) in (j, i) minor
            # order) and convc1 is applied SPLIT — the global half as a
            # token matmul, the window half folded directly onto the
            # query-space chunk (reference rows cg + i*K + j), skipping the
            # per-iteration (B,Q,K,K) -> (B,H,W,81) tile-padded repack.
            # Params identical to the fused conv (`_Conv1x1MirrorParams`).
            g, chunk = corr
            bb, h1, w1, cg = g.shape
            kk = chunk.shape[-1]
            kc, bc = _Conv1x1MirrorParams(
                cg + kk * kk, 256, bias_fan_in=self.cor_planes,
                name="convc1")()
            kc = kc[0, 0]
            # window half through the Pallas fold kernel (chunk-layout-
            # native, carries the bias); global half as a token matmul
            from ..kernels.fold import fold_chunks_conv

            cor_tok = fold_chunks_conv((chunk,), kc[cg:], bc, d)
            cor = jnp.einsum("bhwc,co->bhwo", g.astype(d),
                             kc[:cg].astype(d), precision=HIGH)
            cor = nn.relu(cor + cor_tok.reshape(bb, h1, w1, 256))
        else:
            cor = nn.relu(conv2d(256, 1, 1, 0, name="convc1", dtype=d, in_features=self.cor_planes)(corr))
        cor = nn.relu(conv2d(192, 3, 1, 1, name="convc2", dtype=d, in_features=256)(cor))
        flo = nn.relu(conv2d(128, 7, 1, 3, name="convf1", dtype=d, in_features=2)(flow))
        flo = nn.relu(conv2d(64, 3, 1, 1, name="convf2", dtype=d, in_features=128)(flo))
        out = nn.relu(conv2d(126, 3, 1, 1, name="conv", dtype=d, in_features=256)(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class FFBasicUpdateBlock(nn.Module):
    """`gru.py:90-116` (no GMA)."""

    cor_planes: int
    hidden_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        d = self.dtype
        motion = FFBasicMotionEncoder(self.cor_planes, name="encoder", dtype=d)(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, 128 + self.hidden_dim, name="gru", dtype=d)(net, inp)
        delta = FlowHead(self.hidden_dim, 256, name="flow_head", dtype=d)(net)
        m = nn.relu(conv2d(256, 3, 1, 1, name="mask_0", dtype=d)(net))
        up_mask = 0.25 * conv2d(64 * 9, 1, 1, 0, name="mask_2", dtype=d)(m)
        return net, up_mask, delta


class GMAUpdateBlock(nn.Module):
    """`gru.py:119-146`: adds globally-aggregated motion features."""

    cor_planes: int
    hidden_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow, attention):
        d = self.dtype
        motion = FFBasicMotionEncoder(self.cor_planes, name="encoder", dtype=d)(flow, corr)
        motion_global = GMAAggregate(128, 1, 128, name="aggregator", dtype=d)(attention, motion)
        inp_cat = jnp.concatenate([inp, motion, motion_global], axis=-1)
        net = SepConvGRU(self.hidden_dim, 128 + 2 * self.hidden_dim, name="gru", dtype=d)(net, inp_cat)
        delta = FlowHead(self.hidden_dim, 256, name="flow_head", dtype=d)(net)
        m = nn.relu(conv2d(256, 3, 1, 1, name="mask_0", dtype=d)(net))
        up_mask = 0.25 * conv2d(64 * 9, 1, 1, 0, name="mask_2", dtype=d)(m)
        return net, up_mask, delta
