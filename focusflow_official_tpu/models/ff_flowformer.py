"""FF-FlowFormer: keypoint-conditioned FlowFormer (latent cost transformer).

TPU-native redesign of `/root/reference/core/models/ff-flowformer/
FF_FlowFormer_Core/FlowFormer/LatentCostFormer/{transformer.py,encoder.py,
decoder.py}` for the shipped config (`config/ff_chairs.yaml:41-76`):

- context + feature encoders are 2-stage Twins-SVT (CCE variant mirrors the
  pyramid for the mask, `encoders.py:131-174`);
- the multi-head all-pairs cost volume (no sqrt scaling, `encoder.py:337-348`)
  is compressed per query into K=8 latent tokens by the CostPerceiver
  (cross-attention input layer + depth x (latent self-attention | vertical
  context-conditioned Twins attention));
- the recurrent decoder runs `decoder_depth` (12) refinements: 9x9 cost
  lookup (reusing the gather-free MXU window lookup from `ops/corr.py`),
  latent cross-attention with k/v computed once (the reference caches them
  lazily on iter 0, `decoder.py:63-65` — here they are hoisted before the
  loop), GMA GRU update, convex upsample.

Deliberate fix vs the reference: when batch > 1, the reference tiles the
context for the vertical layers as [c0..cB, c0..cB, ...] while the tokens
are ordered sample-major, silently pairing latent tokens with the wrong
sample's context (`encoder.py:261`, exact only for B==1); we repeat
per-sample (sample-major) so every token sees its own context.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.gma import (FFBasicUpdateBlock, GMAAttention, GMAUpdateBlock,
                      _Conv1x1MirrorParams)
from ..nn.latent_cost import (
    BroadCrossAttentionLayer,
    ConvNextLayer,
    CostPatchEmbed,
    MLPMixerLayer,
    SelfAttentionLayer,
    VerticalSelfAttentionLayer,
    linear_position_embedding_sine,
    _mha,
)
from ..nn.twins import HIGH, TwinsSVT2Stage, TwinsSVT2StageCCE, _dense, _ln, gelu
from ..nn.blocks import conv2d
from ..ops.coords import coords_grid
from ..ops.corr import CorrPyramid, lookup_corr_pyramid
from ..ops.upsample import (convex_upsample, convex_upsample_flat,
                            depth_to_space_flow)
from .mask_modal import init_mask


@dataclasses.dataclass(frozen=True)
class FlowFormerConfig:
    """The `latentcostformer` hyperparameter block (`config/ff_chairs.yaml:41-76`)."""

    fusion: Optional[str] = "parallel"  # None -> vanilla FlowFormer
    # mask handling (TRAIN-level in the reference FF yaml)
    mask_modal: str = "point"
    mask_channel: int = 3
    mask_dilate: int = 31
    kernel_size: int = 31
    kernel_sigma: float = 5.0

    pe: str = "linear"
    encoder_latent_dim: int = 256
    query_latent_dim: int = 64
    cost_latent_input_dim: int = 64
    cost_latent_token_num: int = 8
    cost_latent_dim: int = 128
    cost_heads_num: int = 1
    encoder_depth: int = 3
    decoder_depth: int = 12
    patch_size: int = 8
    gma: bool = True
    vert_c_dim: int = 64
    cost_encoder_res: bool = True
    use_mlp: bool = False
    vertical_conv: bool = False
    only_global: bool = False
    add_flow_token: bool = True
    context_concat: bool = False
    feat_cross_attn: bool = False  # NOTE: broken in the reference too — its
    # MemoryEncoder references self.layers that is never constructed
    # (`encoder.py:372-380`); we raise a clear error instead
    dropout: float = 0.0

    compute_dtype: str = "float32"
    corr_impl: str = "auto"  # lookup impl for the 9x9 decoder window


class CostPerceiverEncoder(nn.Module):
    """`encoder.py:250-317` for the default (attention) configuration."""

    cfg: FlowFormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cost_volume, context=None):
        """cost_volume: (B, heads, H1, W1, H2, W2) -> latent memory
        (B*H1*W1, K, cost_latent_dim); also returns (cost_maps, (H3, W3))."""
        cfg = self.cfg
        d = self.dtype
        b, heads, h1, w1, h2, w2 = cost_volume.shape
        k_tokens = cfg.cost_latent_token_num

        cost_maps = cost_volume.transpose(0, 2, 3, 1, 4, 5).reshape(
            b * h1 * w1, heads, h2, w2
        )
        # NHWC for the conv patch embed
        x, size = CostPatchEmbed(
            cfg.patch_size, heads, cfg.cost_latent_input_dim, name="patch_embed",
            dtype=d,
        )(cost_maps.transpose(0, 2, 3, 1))
        h3, w3 = size

        latent = self.param(
            "latent_tokens", nn.initializers.normal(1.0),
            (1, k_tokens, cfg.cost_latent_dim), jnp.float32,
        )
        x = BroadCrossAttentionLayer(
            cfg.cost_latent_dim, cfg.cost_latent_dim, cfg.cost_latent_dim,
            cfg.cost_latent_input_dim * 2, name="input_layer", dtype=d,
        )(latent.astype(d), x)

        short_cut = x
        for idx in range(cfg.encoder_depth):
            if cfg.use_mlp:
                x = MLPMixerLayer(cfg.cost_latent_dim, k_tokens,
                                  name=f"encoder_layers_{idx}", dtype=d)(x)
            else:
                x = SelfAttentionLayer(cfg.cost_latent_dim,
                                       name=f"encoder_layers_{idx}", dtype=d)(x)
            # (B*H1W1, K, D) -> (B*K, H1W1, D), sample-major
            x = x.reshape(b, h1 * w1, k_tokens, -1).transpose(0, 2, 1, 3)
            x = x.reshape(b * k_tokens, h1 * w1, -1)
            if cfg.vertical_conv:
                xg = x.reshape(b * k_tokens, h1, w1, -1)
                xg = ConvNextLayer(cfg.cost_latent_dim,
                                   name=f"vertical_encoder_layers_{idx}", dtype=d)(xg)
                x = xg.reshape(b * k_tokens, h1 * w1, -1)
            else:
                ctx = None
                if context is not None:
                    # sample-major repeat (see module docstring)
                    ctx = jnp.repeat(context, k_tokens, axis=0)
                x = VerticalSelfAttentionLayer(
                    cfg.cost_latent_dim, cfg.vert_c_dim,
                    name=f"vertical_encoder_layers_{idx}", dtype=d,
                )(x, (h1, w1), ctx)
            x = x.reshape(b, k_tokens, h1 * w1, -1).transpose(0, 2, 1, 3)
            x = x.reshape(b * h1 * w1, k_tokens, -1)

        if cfg.cost_encoder_res:
            x = x + short_cut
        return x, cost_maps.reshape(b, h1 * w1, h2, w2), (h3, w3)


def _multi_head_cost_volume(f1, f2, heads: int):
    """All-pairs cost volume, NO sqrt scaling (`encoder.py:337-348`).

    f1/f2: (B, H, W, C) NHWC -> (B, heads, H, W, H, W).
    """
    b, h, w, c = f1.shape
    hd = c // heads
    a = f1.reshape(b, h * w, heads, hd).transpose(0, 2, 1, 3)
    bb = f2.reshape(b, h * w, heads, hd).transpose(0, 2, 1, 3)
    corr = jnp.einsum("bhid,bhjd->bhij", a, bb, precision=HIGH,
                      preferred_element_type=jnp.float32)
    return corr.reshape(b, heads, h, w, h, w)


class MemoryEncoder(nn.Module):
    """`encoder.py:319-385` (vanilla) — twins feature encoder + perceiver."""

    cfg: FlowFormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2, context=None):
        d = self.dtype
        feats = TwinsSVT2Stage(name="feat_encoder_svt", dtype=d)(
            jnp.concatenate([img1, img2], axis=0)
        )
        feats = conv2d(self.cfg.encoder_latent_dim, 1, 1, 0, use_bias=False,
                       name="channel_convertor", dtype=d)(feats)
        f1, f2 = jnp.split(feats, 2, axis=0)
        if self.cfg.feat_cross_attn:
            raise NotImplementedError(
                "feat_cross_attn is unimplementable: the reference's layer "
                "stack is never constructed (encoder.py:372-380)")
        cost_volume = _multi_head_cost_volume(f1, f2, self.cfg.cost_heads_num)
        return CostPerceiverEncoder(self.cfg, name="cost_perceiver_encoder",
                                    dtype=d)(cost_volume.astype(d), context)


class FusionMemoryEncoder(nn.Module):
    """`encoder.py:388-442` — CCE twins per frame+mask."""

    cfg: FlowFormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2, mask1, mask2, context=None):
        d = self.dtype
        # ONE batched pass over both frames (exact: every CCE-twins op —
        # LN/attention/convs/fusion 1x1s — is per-sample); two sequential
        # B=1 calls underfeed the MXU and double the tower's fixed costs
        feats = TwinsSVT2StageCCE(name="feat_encoder_svt", dtype=d)(
            jnp.concatenate([img1, img2], axis=0),
            jnp.concatenate([mask1, mask2], axis=0),
        )
        feats = conv2d(self.cfg.encoder_latent_dim, 1, 1, 0, use_bias=False,
                       name="channel_convertor", dtype=d)(feats)
        f1, f2 = jnp.split(feats, 2, axis=0)
        cost_volume = _multi_head_cost_volume(f1, f2, self.cfg.cost_heads_num)
        # store the O((HW)^2) volume in the compute dtype: the decoder reads
        # it every iteration and the patch embed convolves all of it — f32
        # storage doubles that HBM traffic (99 MB -> 198 MB at bench shapes)
        return CostPerceiverEncoder(self.cfg, name="cost_perceiver_encoder",
                                    dtype=d)(cost_volume.astype(d), context)


class MemoryDecoderStep(nn.Module):
    """One decoder refinement (`decoder.py:93-149` + GRU update), scanned.

    Wrapped in `nn.scan` by `MemoryDecoder` (the same shared-module scan
    treatment as `ff_raft.RAFTStep`) so 12 iterations compile as ONE step
    body instead of an unrolled 12x HLO. Module names inside match the
    reference's per-iteration modules; the importer drops the scan scope.
    """

    cfg: FlowFormerConfig
    emit_upsampled: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, xs):
        cfg = self.cfg
        d = self.dtype
        dim = cfg.query_latent_dim
        net, coords1, _ = carry
        inp, coords0, cost_maps, k_mem, v_mem, attention = xs
        b, h1, w1 = coords1.shape[:3]
        q_count = h1 * w1

        coords1 = jax.lax.stop_gradient(coords1)
        import os

        # Decoder chunk-fold (round-5 FlowFormer pass): keep the window
        # lookup in its query-space (B, Q, K, K) chunk form and fold BOTH
        # 1x1 consumers (flow_token_encoder_0 here, convc1 in the motion
        # encoder) directly onto it — the RAFT treatment of the same
        # pattern. Skips the per-iteration (B,Q,K,K) -> (B,H1,W1,81)
        # transpose+reshape, whose (9,9) minors are tile-padded to
        # (16,128). Param trees unchanged (`_Conv1x1MirrorParams`).
        # Measured +1.3% fps at the bench protocol (21.59 vs 21.32,
        # BENCH.md round-5 FlowFormer pass) -> default ON at eval
        # (emit_upsampled False == test_mode); training keeps the NHWC
        # form (unmeasured there). FF_DEC_CHUNK=1/0 force-overrides.
        dec_default = "0" if self.emit_upsampled else "1"
        use_chunk = (cfg.cost_heads_num == 1 and not cfg.only_global
                     and cfg.corr_impl in ("auto", "mxu")
                     and os.environ.get("FF_DEC_CHUNK", dec_default) == "1")
        fte2 = conv2d(dim, 1, 1, 0, name="flow_token_encoder_2", dtype=d)
        if use_chunk:
            from ..ops.corr import _lookup_level_mxu_chunk

            # default bf16 lookup dtype == the NHWC path's (`_lookup_level_mxu`)
            chunk = _lookup_level_mxu_chunk(cost_maps, coords1, 4)
            k0, b0 = _Conv1x1MirrorParams(81, dim,
                                          name="flow_token_encoder_0")()
            # Pallas fold kernel (`kernels/fold.py`): consumes the chunk in
            # the row-major layout stage 2 produces — the XLA einsum form
            # paid a 0.45 ms/forward relayout copy on its operand
            # (round-5 xprof); XLA fallback off-TPU
            from ..kernels.fold import fold_chunks_conv

            tok = fold_chunks_conv((chunk,), k0[0, 0], b0, d)
            query = fte2(gelu(tok.reshape(b, h1, w1, dim)))
            cost_forward = None
        else:
            pyramid = CorrPyramid(levels=(cost_maps,), radius=4)
            cost_forward = lookup_corr_pyramid(pyramid, coords1,
                                               impl=cfg.corr_impl,
                                               num_levels=1)
            cost_forward = cost_forward.astype(d)  # (B, H1, W1, 81)

            fte0 = conv2d(dim, 1, 1, 0, name="flow_token_encoder_0", dtype=d)
            query = fte2(gelu(fte0(cost_forward)))
        query = query.reshape(b * q_count, 1, dim)

        # positional query from the current coords (`decoder.py:67-81`)
        qc = coords1.reshape(b * q_count, 1, 2)
        qc_enc = linear_position_embedding_sine(qc, dim=dim).astype(d)

        short_cut = query
        qn = _ln("decoder_layer_cross_attend_norm1", d, eps=1e-5)(query)
        q_lin = _dense(dim, "decoder_layer_cross_attend_q", d)
        q = q_lin(qn + qc_enc) if cfg.add_flow_token else q_lin(qc_enc)
        x = _mha(q, k_mem, v_mem, 8, (dim / 8) ** -0.5)
        x = _dense(dim, "decoder_layer_cross_attend_proj", d)(
            jnp.concatenate([x, short_cut], axis=2)
        )
        x = short_cut + x
        xn = _ln("decoder_layer_cross_attend_norm2", d, eps=1e-5)(x)
        ffn0 = _dense(dim, "decoder_layer_cross_attend_ffn_0", d)
        ffn3 = _dense(dim, "decoder_layer_cross_attend_ffn_3", d)
        x = x + ffn3(gelu(ffn0(xn)))
        cost_global = x.reshape(b, h1, w1, dim)

        if cfg.only_global:
            corr = cost_global
        elif use_chunk:
            corr = (cost_global, chunk)  # convc1 folds onto the chunk
        else:
            corr = jnp.concatenate([cost_global, cost_forward], axis=-1)
        flow = (coords1 - coords0).astype(d)
        cor_planes = dim if cfg.only_global else 81 * cfg.cost_heads_num + dim
        if cfg.gma:
            update_block = GMAUpdateBlock(cor_planes, 128, name="update_block",
                                          dtype=d)
            net, up_mask, delta = update_block(net, inp, corr, flow, attention)
        else:
            update_block = FFBasicUpdateBlock(cor_planes, 128, name="update_block",
                                              dtype=d)
            net, up_mask, delta = update_block(net, inp, corr, flow)
        coords1 = coords1 + delta.astype(jnp.float32)
        up_mask = up_mask.astype(jnp.float32)

        if self.emit_upsampled:
            # compact (B, H, W, 64, 2); depth-to-space once after the scan
            flow_up = convex_upsample_flat(coords1 - coords0, up_mask)
        else:
            flow_up = jnp.zeros((), jnp.float32)  # test mode: upsample once after
        return (net, coords1, up_mask), flow_up


class MemoryDecoder(nn.Module):
    """`decoder.py:151-260`: recurrent latent decoding with GMA updates.

    The latent k/v are computed once before the loop (the reference caches
    them lazily on iter 0, `decoder.py:63-65`); the `decoder_depth`
    refinements run as one `nn.scan` over a shared-parameter step module.
    """

    cfg: FlowFormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cost_memory, cost_maps, h3w3, context, flow_init=None,
                 test_mode: bool = False):
        cfg = self.cfg
        d = self.dtype
        dim = cfg.query_latent_dim
        b, h1, w1, _ = context.shape

        context = conv2d(256, 1, 1, 0, name="proj", dtype=d)(context)
        net = jnp.tanh(context[..., :128])
        inp = nn.relu(context[..., 128:])
        attention = jnp.zeros((), d)
        if cfg.gma:
            attention = GMAAttention(128, 1, 128, name="att", dtype=d)(inp)

        coords0 = coords_grid(b, h1, w1)
        coords1 = coords0 if flow_init is None else coords0 + flow_init

        # hoisted latent k/v (constant across iterations)
        k_mem = _dense(dim, "decoder_layer_cross_attend_k", d)(cost_memory)
        v_mem = _dense(dim, "decoder_layer_cross_attend_v", d)(cost_memory)

        Step = nn.scan(
            MemoryDecoderStep,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=nn.broadcast,
            out_axes=0,
            length=cfg.decoder_depth,
        )
        step = Step(cfg, emit_upsampled=not test_mode, dtype=d, name="update_step")
        up_mask0 = jnp.zeros((b, h1, w1, 64 * 9), jnp.float32)
        (net, coords1, up_mask), flows = step(
            (net, coords1, up_mask0),
            (inp, coords0, cost_maps, k_mem, v_mem, attention),
        )

        if test_mode:
            flow_up = convex_upsample(coords1 - coords0, up_mask)
            return flow_up, coords1 - coords0
        return depth_to_space_flow(flows)  # (decoder_depth, B, 8h, 8w, 2)


class FlowFormer(nn.Module):
    """Vanilla FlowFormer (`transformer.py:85-122`)."""

    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, image1, image2, mask1=None, mask2=None, iters=None,
                 flow_init=None, test_mode: bool = False, train: bool = False):
        cfg = self.cfg
        d = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        image1 = (2 * (image1 / 255.0) - 1.0).astype(d)
        image2 = (2 * (image2 / 255.0) - 1.0).astype(d)

        context = TwinsSVT2Stage(name="context_encoder_svt", dtype=d)(image1)
        cost_memory, cost_maps, h3w3 = MemoryEncoder(cfg, name="memory_encoder",
                                                     dtype=d)(image1, image2, context)
        return MemoryDecoder(cfg, name="memory_decoder", dtype=d)(
            cost_memory, cost_maps, h3w3, context, flow_init, test_mode
        )


class FFFlowFormer(nn.Module):
    """FF_FlowFormer (`transformer.py:125-176`): CCE everywhere + mask modal."""

    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, image1, image2, mask1=None, mask2=None, iters=None,
                 flow_init=None, test_mode: bool = False, train: bool = False):
        cfg = self.cfg
        d = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        mask1, mask2 = init_mask(
            image1, image2, mask1, mask2, mask_modal=cfg.mask_modal,
            mask_channel=cfg.mask_channel, mask_dilate=cfg.mask_dilate,
            kernel_size=cfg.kernel_size, kernel_sigma=cfg.kernel_sigma,
        )
        image1 = (2 * (image1 / 255.0) - 1.0).astype(d)
        image2 = (2 * (image2 / 255.0) - 1.0).astype(d)
        mask1 = (2 * (mask1 / 255.0) - 1.0).astype(d)
        mask2 = (2 * (mask2 / 255.0) - 1.0).astype(d)

        context = TwinsSVT2StageCCE(name="context_encoder_svt", dtype=d)(image1, mask1)
        cost_memory, cost_maps, h3w3 = FusionMemoryEncoder(
            cfg, name="memory_encoder", dtype=d
        )(image1, image2, mask1, mask2, context)
        return MemoryDecoder(cfg, name="memory_decoder", dtype=d)(
            cost_memory, cost_maps, h3w3, context, flow_init, test_mode
        )
