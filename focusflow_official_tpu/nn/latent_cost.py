"""Latent cost-volume encoder pieces (FlowFormer's CostPerceiver, flax).

Equivalents of `/root/reference/core/models/ff-flowformer/FF_FlowFormer_Core/
FlowFormer/LatentCostFormer/{encoder.py,attention.py,twins.py,mlpmixer.py,
convnext.py}` for the default config (cost_heads_num 1, pe 'linear',
K=8 latent tokens, cost_latent_dim 128, encoder_depth 3, vert_c_dim 64):

- per-query cost maps are patch-embedded (stride-8 conv stack + linear
  sine position encoding) into tokens;
- 8 learned latent tokens cross-attend to them (`input_layer`);
- encoder_depth x (self-attention over the K tokens | MLPMixer) alternated
  with (vertical local+global Twins RPE attention over the H1xW1 grid,
  context-conditioned via a 256->vert_c_dim projection | ConvNext);
- all attention runs in token layout; matmuls pinned to HIGHEST precision.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.coords import coords_grid
from .twins import HIGH, _dense, _ln, gelu


def linear_position_embedding_sine(x: jnp.ndarray, dim: int,
                                   normalize_factor: float = 1.0 / 200) -> jnp.ndarray:
    """LinearPositionEmbeddingSine (`attention.py:151-155`): x (..., 2) -> (..., dim)."""
    freq = jnp.linspace(0, dim // 4 - 1, dim // 4, dtype=jnp.float32)
    px = x[..., -2:-1].astype(jnp.float32) * freq * (3.14 * normalize_factor)
    py = x[..., -1:].astype(jnp.float32) * freq * (3.14 * normalize_factor)
    return jnp.concatenate([jnp.sin(px), jnp.cos(px), jnp.sin(py), jnp.cos(py)], axis=-1)


def _mha(q, k, v, heads: int, scale: float):
    """MultiHeadAttention (`attention.py:38-63`): q (B,N,C), k/v (B,M,C).

    Two lowerings (round-3 xprof of the FlowFormer memory encoder):

    - N <= 16 (the perceiver's latent-token attentions: 8 latent queries,
      and the decoder's 1-query cross-attend, at batch B*H1W1 ~ 7k): the
      einsum form becomes 56k batched (8x16)@(16x8) micro-dots — MXU feed
      overhead and relayout copies cost ~2 ms/layer against a ~0.1 ms
      floor. A broadcast-multiply-reduce keeps it one VPU loop fusion.
    - otherwise: batched einsum with the head axis split IN PLACE — the
      explicit head-major transposes cost ~0.7 ms each in relayout copies
      on (7040, 112, 128)-shaped token tensors.
    """
    b, n, c = q.shape
    m = k.shape[1]
    hd = c // heads
    vd = v.shape[-1] // heads
    qh = q.reshape(b, n, heads, hd)
    kh = k.reshape(b, m, heads, hd)
    vh = v.reshape(b, m, heads, vd)
    if n <= 16:
        kht = kh.transpose(0, 2, 1, 3)  # (B, h, M, d) — small
        vht = vh.transpose(0, 2, 1, 3)
        # score/softmax dtype keyed on the compute dtype: on the bf16 path
        # the materialized (B, N, h, M) score tensor and its softmax chain
        # are ~400 MB of f32 loop-fusion traffic at bench shapes (round-5
        # xprof, input_layer scope); bf16 accumulation over the 16-wide
        # head dim is within the path's rounding budget (trained-gate
        # bounded). f32 inputs keep the f32 chain (parity suites).
        acc_dt = jnp.float32 if qh.dtype == jnp.float32 else qh.dtype
        s = jnp.sum(qh[:, :, :, None, :] * kht[:, None], axis=-1,
                    dtype=acc_dt)  # (B, N, h, M), M minor
        p = jax.nn.softmax(s * scale, axis=-1).astype(vht.dtype)
        out = jnp.sum(p[..., None] * vht[:, None], axis=3)  # (B, N, h, vd)
        return out.reshape(b, n, -1)
    attn = jnp.einsum("bihd,bjhd->bhij", qh, kh, precision=HIGH) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhij,bjhd->bihd", attn, vh, precision=HIGH)
    return out.reshape(b, n, -1)


class _Conv1x1Params(nn.Module):
    """Parameter-only mirror of an `nn.Conv(cout, (1, 1))`: same names,
    shapes, dtypes, and default inits under the same module path, so the
    checkpoint/import tree is byte-identical while the caller applies the
    kernel in a split form (cf. `cce._ConvParams`)."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.cin, self.cout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.cout,), jnp.float32)
        return k, b


class CostPatchEmbed(nn.Module):
    """Cost-map patch embed (`encoder.py:26-83`), patch_size 8, pe 'linear'.

    Input (B*H1W1, H2, W2, heads) NHWC -> tokens (B*H1W1, H3*W3, 2*embed_dim).
    """

    patch_size: int = 8
    in_chans: int = 1
    embed_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        d = self.dtype
        b, h, w, _ = x.shape
        pad_r = (p - w % p) % p
        pad_b = (p - h % p) % p
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

        def conv(c, name):
            return nn.Conv(c, (6, 6), strides=(2, 2), padding=((2, 2), (2, 2)),
                           dtype=d, param_dtype=jnp.float32, precision=HIGH, name=name)

        if p == 8:
            x = nn.relu(conv(self.embed_dim // 4, "proj_0")(x))
            x = nn.relu(conv(self.embed_dim // 2, "proj_2")(x))
            x = conv(self.embed_dim, "proj_4")(x)
        elif p == 4:
            x = nn.relu(conv(self.embed_dim // 4, "proj_0")(x))
            x = conv(self.embed_dim, "proj_2")(x)
        else:
            raise ValueError(f"patch size {p} unacceptable")
        out_size = x.shape[1:3]

        c2 = self.embed_dim * 2
        ed = self.embed_dim
        # ffn_with_coord_0 with the position branch FOLDED OUT (round-5
        # FlowFormer pass): the sine encoding of the patch-center grid is
        # IDENTICAL for every one of the B = H1*W1 cost maps, so
        # conv(cat(x, enc)) = x @ k[:ed] + (enc1 @ k[ed:] + bias) with the
        # bracket computed once at batch 1 — the (B, h3, w3, ed) enc
        # tensor and the (B, h3, w3, 2*ed) concat never materialize
        # (~300 MB of HBM traffic at bench shapes). Param tree unchanged
        # (`_Conv1x1Params`); reference: `encoder.py:26-83`.
        kf, bf = _Conv1x1Params(c2, c2, name="ffn_with_coord_0")()
        coord1 = coords_grid(1, *out_size) * p + p / 2  # (1, h3, w3, 2)
        enc1 = linear_position_embedding_sine(coord1, dim=ed).astype(d)
        import os

        if os.environ.get("FF_PE_FOLD", "0") == "0":
            # concat form — the measured DEFAULT at the final round-5
            # build: the same-session control beat the folded form 22.41
            # vs 21.81 fps (the fold's earlier +0.2 was a cross-session
            # misattribution; with the decoder chunk-fold in place the
            # broadcast+concat fuses into the conv better than the
            # split-kernel two-dot form). FF_PE_FOLD=1 keeps the folded
            # variant as the documented negative.
            enc_b = jnp.broadcast_to(enc1, (b, *enc1.shape[1:]))
            xp = jnp.concatenate([x, enc_b], axis=-1)
            xp = jnp.einsum("bhwc,co->bhwo", xp, kf[0, 0].astype(d),
                            precision=HIGH) + bf.astype(d)
        else:
            const = jnp.einsum("bhwc,co->bhwo", enc1, kf[0, 0, ed:].astype(d),
                               precision=HIGH) + bf.astype(d)
            xp = jnp.einsum("bhwc,co->bhwo", x, kf[0, 0, :ed].astype(d),
                            precision=HIGH) + const
        xp = nn.relu(xp)
        xp = nn.Conv(c2, (1, 1), dtype=d, param_dtype=jnp.float32, precision=HIGH,
                     name="ffn_with_coord_2")(xp)
        # LN on the NHWC form BEFORE the token flatten (same last-axis math):
        # normalizing the flattened (B, h3*w3, C2) tensor made XLA bridge the
        # conv layout and the LN layout with a 1.2 ms relayout copy at bench
        # shapes (round-3 xprof)
        xp = _ln("norm", d, eps=1e-5)(xp)
        return xp.reshape(b, -1, c2), out_size


class BroadCrossAttentionLayer(nn.Module):
    """Encoder input layer (`encoder.py:200-247`): shared latent-token queries
    cross-attend to per-cost-map tokens (BroadMultiHeadAttention)."""

    qk_dim: int
    v_dim: int
    query_token_dim: int
    tgt_token_dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, tgt):  # query (1, K, Cq), tgt (B, M, Ct)
        d = self.dtype
        scale = (self.qk_dim / self.num_heads) ** -0.5
        short_cut = query
        qn = _ln("norm1", d, eps=1e-5)(query)
        q = _dense(self.qk_dim, "q", d)(qn)  # (1, K, qk)
        k = _dense(self.qk_dim, "k", d)(tgt)
        v = _dense(self.v_dim, "v", d)(tgt)

        b = tgt.shape[0]
        q = jnp.broadcast_to(q, (b, *q.shape[1:]))
        x = _mha(q, k, v, self.num_heads, scale)
        x = _dense(self.query_token_dim, "proj", d)(x)
        x = short_cut + x  # broadcasts (1,K,C) + (B,K,C)

        xn = _ln("norm2", d, eps=1e-5)(x)
        ff = _dense(self.query_token_dim, "ffn_0", d)(xn)
        ff = gelu(ff)
        ff = _dense(self.query_token_dim, "ffn_3", d)(ff)
        return x + ff


class SelfAttentionLayer(nn.Module):
    """Self-attention over the K latent tokens (`encoder.py:147-190`)."""

    dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, K, C)
        d = self.dtype
        scale = (self.dim // self.num_heads) ** -0.5
        short_cut = x
        xn = _ln("norm1", d, eps=1e-5)(x)
        q = _dense(self.dim, "q", d)(xn)
        k = _dense(self.dim, "k", d)(xn)
        v = _dense(self.dim, "v", d)(xn)
        # NOTE reference MultiHeadAttention scale is (dim/heads)^-0.5
        y = _mha(q, k, v, self.num_heads, (self.dim / self.num_heads) ** -0.5)
        y = _dense(self.dim, "proj", d)(y)
        x = short_cut + y
        xn = _ln("norm2", d, eps=1e-5)(x)
        ff = _dense(self.dim, "ffn_0", d)(xn)
        ff = gelu(ff)
        ff = _dense(self.dim, "ffn_3", d)(ff)
        return x + ff


class MLPMixerLayer(nn.Module):
    """`mlpmixer.py:24-50`: token-mixing (over K) + channel-mixing MLPs."""

    dim: int
    token_num: int
    expansion_factor: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, K, D)
        d = self.dtype
        k, ef = self.token_num, self.expansion_factor
        # token mixing: Conv1d(kernel 1) over the K axis == dense on axis 1
        xn = _ln("mlpmixer_0_norm", d, eps=1e-5)(x)
        y = xn.transpose(0, 2, 1)  # (B, D, K)
        y = _dense(k * ef, "mlpmixer_0_fn_0", d)(y)
        y = gelu(y)
        y = _dense(k, "mlpmixer_0_fn_3", d)(y)
        x = x + y.transpose(0, 2, 1)

        xn = _ln("mlpmixer_1_norm", d, eps=1e-5)(x)
        y = _dense(self.dim * ef, "mlpmixer_1_fn_0", d)(xn)
        y = gelu(y)
        y = _dense(self.dim, "mlpmixer_1_fn_3", d)(y)
        return x + y


class ConvNextBlock(nn.Module):
    """`convnext.py:23-60`: dw7x7 -> LN -> 4x MLP -> layer scale, NHWC."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        d = self.dtype
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, dtype=d, param_dtype=jnp.float32,
                    precision=HIGH, name="dwconv")(x)
        x = _ln("norm", d, eps=1e-6)(x)
        x = _dense(4 * self.dim, "pwconv1", d)(x)
        x = gelu(x)
        x = _dense(self.dim, "pwconv2", d)(x)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,), jnp.float32)
        return inp + gamma * x


class ConvNextLayer(nn.Module):
    dim: int
    depth: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j in range(self.depth):
            x = ConvNextBlock(self.dim, name=f"net_{j}", dtype=self.dtype)(x)
        return x


class _ContextProj(nn.Module):
    vert_c_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, context, b, h, w):
        """context (B0, H, W, 256) tiled to batch b, projected to vert_c_dim."""
        reps = b // context.shape[0]
        ctx = jnp.tile(context, (reps, 1, 1, 1))
        return _dense(self.vert_c_dim, "context_proj", self.dtype)(ctx)  # (b,H,W,vc)


class LocallyGroupedAttnRPEContext(nn.Module):
    """LSA with per-window sine RPE and context-augmented q/k
    (`twins.py:229-304`)."""

    dim: int
    num_heads: int
    ws: int = 7
    vert_c_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size, context=None):
        d = self.dtype
        b, n, c = x.shape
        h, w = size
        nh, hd = self.num_heads, c // self.num_heads
        scale = hd**-0.5
        ws = self.ws
        c_qk = c + self.vert_c_dim

        xg = x.reshape(b, h, w, c)
        if self.vert_c_dim > 0:
            ctx = _ContextProj(self.vert_c_dim, name="ctx", dtype=d)(context, b, h, w)
            x_qk = jnp.concatenate([xg, ctx], axis=-1)
        else:
            x_qk = xg

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        xg = jnp.pad(xg, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x_qk = jnp.pad(x_qk, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        nh_, nw_ = hp // ws, wp // ws

        # per-window coords (0..ws-1), sine-encoded at C_qk dims
        coord = coords_grid(1, ws, ws).reshape(1, ws * ws, 2)
        enc = linear_position_embedding_sine(coord, dim=c_qk).astype(d)  # (1, ws*ws, c_qk)

        # Opt-in (FF_PALLAS_LSA=1) fused window kernel: the q/k/v denses
        # are token-pointwise and the RPE is per-window-position, so both
        # commute with window partitioning — compute them in NATURAL
        # padded layout and hand the kernel unpermuted operands. Bench-
        # MEASURED A LOSS (18.97 vs 21.03 fps): Mosaic issues the 2,432
        # tiny per-window-per-head dots serially. Kept as the documented
        # negative (`kernels/window_attention.py`); the default below is
        # the reference partition-then-dense lowering, unchanged. (An
        # XLA-only transpose-minimal variant also lost: 16.56 vs 18.41,
        # round 4 — this attention's shapes simply resist reformulation.)
        import os as _os

        if _os.environ.get("FF_PALLAS_LSA", "0") == "1":
            from ..kernels.window_attention import (
                window_attention, window_attention_supported)

            if window_attention_supported(ws, c, nh, wp):
                enc_grid = jnp.tile(enc.reshape(1, ws, ws, c_qk),
                                    (1, nh_, nw_, 1))
                xe = x_qk + enc_grid
                q = _dense(c, "q", d)(xe)
                k = _dense(c, "k", d)(xe)
                v = _dense(c, "v", d)(xg)
                out = window_attention(q, k, v, ws, nh, scale)[:, :h, :w]
                return _dense(c, "proj", d)(out.reshape(b, n, c))

        def windows(t, ch):
            t = t.reshape(b, nh_, ws, nw_, ws, ch).transpose(0, 1, 3, 2, 4, 5)
            return t.reshape(b, nh_ * nw_, ws * ws, ch)

        v = _dense(c, "v", d)(windows(xg, c))
        xw_qk = windows(x_qk, c_qk) + enc[:, None]

        q = _dense(c, "q", d)(xw_qk)
        k = _dense(c, "k", d)(xw_qk)

        def heads(t):
            return t.reshape(b, nh_ * nw_, ws * ws, nh, hd).transpose(0, 1, 3, 2, 4)

        attn = jnp.einsum("bwhid,bwhjd->bwhij", heads(q), heads(k), precision=HIGH) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bwhij,bwhjd->bwhid", attn, heads(v), precision=HIGH)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, nh_, nw_, ws, ws, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)[:, :h, :w]
        out = out.reshape(b, n, c)
        return _dense(c, "proj", d)(out)


class GlobalSubSampleAttnRPEContext(nn.Module):
    """GSA with absolute sine RPE and context-augmented q/k
    (`twins.py:306-392`)."""

    dim: int
    num_heads: int
    sr_ratio: int = 4
    vert_c_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size, context=None):
        d = self.dtype
        b, n, c = x.shape
        h, w = size
        nh, hd = self.num_heads, c // self.num_heads
        scale = hd**-0.5
        sr = self.sr_ratio
        c_qk = c + self.vert_c_dim

        xg = x.reshape(b, h, w, c)
        if self.vert_c_dim > 0:
            ctx = _ContextProj(self.vert_c_dim, name="ctx", dtype=d)(context, b, h, w)
            x_qk = jnp.concatenate([xg, ctx], axis=-1)
        else:
            x_qk = xg

        pad_b = (sr - h % sr) % sr
        pad_r = (sr - w % sr) % sr
        xg = jnp.pad(xg, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x_qk = jnp.pad(x_qk, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        coord = coords_grid(1, hp, wp).reshape(1, hp * wp, 2)
        enc = linear_position_embedding_sine(coord, dim=c_qk).astype(d)
        q_in = x_qk.reshape(b, hp * wp, c_qk) + enc
        q = _dense(c, "q", d)(q_in)

        if sr > 1:
            xk = nn.Conv(c, (sr, sr), strides=(sr, sr), dtype=d, param_dtype=jnp.float32,
                         precision=HIGH, name="sr_key")(x_qk)
            xv = nn.Conv(c, (sr, sr), strides=(sr, sr), dtype=d, param_dtype=jnp.float32,
                         precision=HIGH, name="sr_value")(xg)
            norm = _ln("norm", d, eps=1e-5)
            xk = norm(xk.reshape(b, -1, c))
            xv = norm(xv.reshape(b, -1, c))
        else:
            xk = xv = x_qk.reshape(b, -1, c)

        coord2 = coords_grid(1, hp // sr, wp // sr).reshape(1, -1, 2) * sr
        enc2 = linear_position_embedding_sine(coord2, dim=c).astype(d)
        k = _dense(c, "k", d)(xk + enc2)
        v = _dense(c, "v", d)(xv)

        # fused single-pass attention (kernels/attention.py): kv is the
        # sr-subsampled grid and fits VMEM whole
        from ..kernels.attention import small_kv_attention

        out = small_kv_attention(q, k, v, nh, scale)
        out = out.reshape(b, hp, wp, c)[:, :h, :w]
        out = out.reshape(b, n, c)
        return _dense(c, "proj", d)(out)


class RPEBlock(nn.Module):
    """Transformer block around an RPE(-context) attention (`twins.py:750-788`)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 4
    ws: int = 7  # >1 -> local, 1 -> global-subsample
    vert_c_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size, context=None):
        d = self.dtype
        if self.ws > 1:
            attn = LocallyGroupedAttnRPEContext(self.dim, self.num_heads, self.ws,
                                                self.vert_c_dim, name="attn", dtype=d)
        else:
            attn = GlobalSubSampleAttnRPEContext(self.dim, self.num_heads, self.sr_ratio,
                                                 self.vert_c_dim, name="attn", dtype=d)
        x = x + attn(_ln("norm1", d, eps=1e-6)(x), size, context)
        from .twins import TwinsMlp

        x = x + TwinsMlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp",
                         dtype=d)(_ln("norm2", d, eps=1e-6)(x))
        return x


class VerticalSelfAttentionLayer(nn.Module):
    """Local + global RPE-context blocks over the H1xW1 grid
    (`encoder.py:112-138`)."""

    dim: int
    vert_c_dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size, context=None):
        x = RPEBlock(self.dim, self.num_heads, 4.0, 4, 7, self.vert_c_dim,
                     name="local_block", dtype=self.dtype)(x, size, context)
        x = RPEBlock(self.dim, self.num_heads, 4.0, 4, 1, self.vert_c_dim,
                     name="global_block", dtype=self.dtype)(x, size, context)
        return x


class GroupAttnRPEContext(nn.Module):
    """5-way shifted group attention (`twins.py:64-151` / `:153-227`).

    The batch is split into 5 groups whose k/v are shifted by one window
    up / down / left / right / none, so different latent-token groups attend
    to displaced neighborhoods. Requires batch % 5 == 0 (the reference
    asserts cost_latent_token_num % 5 == 0). `vert_c_dim=0` gives the
    context-free GroupAttnRPE.
    """

    dim: int
    num_heads: int
    ws: int = 7
    vert_c_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size, context=None):
        d = self.dtype
        b, n, c = x.shape
        h, w = size
        nh, hd = self.num_heads, c // self.num_heads
        scale = hd**-0.5
        ws = self.ws
        c_qk = c + self.vert_c_dim
        bn = b // 5

        xg = x.reshape(b, h, w, c)
        if self.vert_c_dim > 0:
            ctx = _ContextProj(self.vert_c_dim, name="ctx", dtype=d)(context, b, h, w)
            x_qk = jnp.concatenate([xg, ctx], axis=-1)
        else:
            x_qk = xg

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        xg = jnp.pad(xg, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x_qk = jnp.pad(x_qk, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        nh_, nw_ = hp // ws, wp // ws

        coord = coords_grid(1, hp, wp).reshape(1, hp * wp, 2)
        enc = linear_position_embedding_sine(coord, dim=c_qk).astype(d)
        enc = enc.reshape(1, hp, wp, c_qk)

        q = _dense(c, "q", d)(x_qk + enc)
        k = _dense(c, "k", d)(x_qk + enc)
        v = _dense(c, "v", d)(xg)

        # shift k/v per batch group (`twins.py:126-132`): each group's k/v rows
        # come from a ws-displaced copy with edge rows repeated
        kv = jnp.concatenate([k, v], axis=-1)
        g = [kv[i * bn : (i + 1) * bn] for i in range(5)]
        kv_up = jnp.concatenate([g[0][:, ws:hp], g[0][:, hp - ws : hp]], axis=1)
        kv_down = jnp.concatenate([g[1][:, :ws], g[1][:, : hp - ws]], axis=1)
        kv_left = jnp.concatenate([g[2][:, :, ws:wp], g[2][:, :, wp - ws : wp]], axis=2)
        kv_right = jnp.concatenate([g[3][:, :, :ws], g[3][:, :, : wp - ws]], axis=2)
        kv = jnp.concatenate([kv_up, kv_down, kv_left, kv_right, g[4]], axis=0)
        k, v = kv[..., :c], kv[..., c:]

        def windows(t):
            t = t.reshape(b, nh_, ws, nw_, ws, c).transpose(0, 1, 3, 2, 4, 5)
            t = t.reshape(b, nh_ * nw_, ws * ws, nh, hd)
            return t.transpose(0, 1, 3, 2, 4)

        attn = jnp.einsum("bwhid,bwhjd->bwhij", windows(q), windows(k),
                          precision=HIGH) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bwhij,bwhjd->bwhid", attn, windows(v), precision=HIGH)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, nh_, nw_, ws, ws, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)[:, :h, :w]
        return _dense(c, "proj", d)(out.reshape(b, n, c))


class GroupVerticalSelfAttentionLayer(nn.Module):
    """`encoder.py:87-110`: single group-attention block over the H1xW1 grid."""

    dim: int
    vert_c_dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size, context=None):
        d = self.dtype
        attn = GroupAttnRPEContext(self.dim, self.num_heads, 7, self.vert_c_dim,
                                   name="block_attn", dtype=d)
        y = attn(_ln("block_norm1", d, eps=1e-6)(x), size, context)
        x = x + y
        from .twins import TwinsMlp

        x = x + TwinsMlp(self.dim, self.dim * 4, name="block_mlp",
                         dtype=d)(_ln("block_norm2", d, eps=1e-6)(x))
        return x
