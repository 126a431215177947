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

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import (
    ResidualBlock,
    TiledInputConv,
    conv2d,
    _stem,
    kaiming_out,
    torch_bias_init,
)
from .fusion_units import FusionUnit
from .norm import (
    Norm,
    instance_norm_eval,
    instance_norm_rowchunks,
    zero_virtual_rows,
)

# Manual space-to-batch for the stem+layer1 head (eval only): XLA's own
# space-to-batch conv rewrite — worth 2.4x on the low-channel convs
# (BENCH.md Finding 4) — is vetoed by the Pallas IN-stats custom call.
# Chunking the rows OURSELVES with a 12-row halo gives the convs a big
# batch without XLA's pass, and the instance norms compute exact global
# stats from the disjoint chunk cores (`Norm(row_chunks=...)`), so no
# custom call is needed in the chunked region at all.
_HALO = 12  # input rows each side: stem 7x7/2 (3) + 4x conv3x3 at /2 (2*4), rounded even


def _row_chunk_plan(h: int):
    """Pick nc so H/2 splits into equal cores of 40-64 rows (then 20-39),
    preferring the LARGEST core in the band: the halo recompute scales
    with nc, and the bench-shape sweep (h2=220, BENCH.md Finding 13)
    measured cores 55 > 44 > 110 (44.97 / 41.31 / 41.25 fps) — bigger
    cores win inside the band, but leaving the band (nc=2) loses the
    space-to-batch width.

    FF_CHUNK_NC forces a specific chunk count (perf experiments only;
    rejected if it doesn't divide H/2)."""
    h2 = h // 2
    forced = os.environ.get("FF_CHUNK_NC")
    if forced:
        nc = int(forced)
        return nc if nc > 1 and h2 % nc == 0 else None
    for lo, hi in ((40, 65), (20, 40)):
        for ch2 in range(hi - 1, lo - 1, -1):
            if h2 % ch2 == 0 and h2 // ch2 > 1:
                return h2 // ch2
    return None


def _chunk_rows(x: jnp.ndarray, nc: int, halo: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nc, H/nc + 2*halo, W, C), zero-padded halos
    (coincides with conv zero padding at the true image borders)."""
    b, h, w, c = x.shape
    ch = h // nc
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    slabs = [xp[:, i * ch : i * ch + ch + 2 * halo] for i in range(nc)]
    y = jnp.stack(slabs, axis=1)  # (B, nc, ch+2halo, W, C)
    return y.reshape(b * nc, ch + 2 * halo, w, c)


def _unchunk_rows(y: jnp.ndarray, b: int, nc: int, margin: int) -> jnp.ndarray:
    """Crop the chunk margins and reassemble (B*nc, rows, W, C) -> (B, H', W, C)."""
    bn, rows, w, c = y.shape
    core = y[:, margin : rows - margin]
    return core.reshape(b, nc * (rows - 2 * margin), w, c)


# --- packed branch-pair execution for the chunked stem+layer1 region -------
#
# The image and mask branches run identical-SHAPE 64-channel convs with
# different weights; 64 output channels half-fill the MXU's 128 lanes
# (BENCH.md: dense 128ch has ~2.2x the per-FLOP efficiency of 64ch, and an
# 8-conv chain at the chunked layer1 shape measured 6.9 ms packed vs 10.0 ms
# as separate branches). Packing both branches onto one 128-channel tensor
# with BLOCK-DIAGONAL kernels (built at trace time from the unchanged
# per-branch params — loop-invariant, hoisted by XLA) doubles lane fill for
# 2x the nominal FLOPs, a measured net win, and halves the op count of the
# norm/re-zero machinery. The instance norm is per-channel and param-free,
# so the packed tensor goes through the SAME `instance_norm_rowchunks`; the
# parameter tree is untouched — `_ConvParams` mirrors declare exactly the
# names/shapes/inits `conv2d` would, under the same module paths
# (`tests/test_packed_cce.py` locks both the tree and the outputs).
#
# Packing convention: channels [:C] = image branch, [C:] = mask branch.


class _ConvParams(nn.Module):
    """Parameter-tree mirror of `conv2d(...)` (flax nn.Conv): declares the
    same kernel/bias names, shapes, and initializers WITHOUT computing a
    conv — the packed path fetches per-branch weights and fuses them at
    trace time. Must stay in lockstep with `blocks.conv2d`."""

    features: int
    kernel: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", kaiming_out,
            (self.kernel, self.kernel, self.in_features, self.features),
            jnp.float32)
        fan_in = self.in_features * self.kernel * self.kernel
        b = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: torch_bias_init(
                key, shape, dtype, fan_in),
            (self.features,), jnp.float32)
        return k, b


class _Conv1x1FusionParams(nn.Module):
    """Mirror of `fusion_units.Conv1x1` (child conv named 'conv')."""

    channels: int

    @nn.compact
    def __call__(self):
        return _ConvParams(self.channels, 1, self.channels, name="conv")()


class _FusionUnitParams(nn.Module):
    """Mirror of a bidirectional 1x1conv `FusionUnit`."""

    channels: int

    @nn.compact
    def __call__(self):
        m2i = _Conv1x1FusionParams(self.channels, name="mask2img")()
        i2m = _Conv1x1FusionParams(self.channels, name="img2mask")()
        return m2i, i2m


class _ResBlockParams(nn.Module):
    """Mirror of a `ResidualBlock` (instance norm declares no params; the
    stride!=1 variant adds the 1x1 downsample conv, whose norm3 is also
    param-free instance)."""

    in_planes: int
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self):
        ci, c = self.in_planes, self.planes
        k1 = _ConvParams(c, 3, ci, name="conv1")()
        k2 = _ConvParams(c, 3, c, name="conv2")()
        if self.stride != 1:
            kd = _ConvParams(c, 1, ci, name="downsample_conv")()
            return k1, k2, kd
        return k1, k2


class _NormBNParams(nn.Module):
    """Mirror of `Norm(kind='batch')`: declares the same scale/bias params
    and batch_stats {mean, var} variables (all RNG-independent inits), and
    returns them for the packed eval affine. Must stay in lockstep with
    `norm.Norm`'s batch branch."""

    features: int

    @nn.compact
    def __call__(self):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        return scale, bias, mean.value, var.value


class _ResBlockBNParams(nn.Module):
    """Mirror of a batch-norm `ResidualBlock`: same child names/shapes as
    `blocks.ResidualBlock` (conv1/norm1/conv2/norm2[/downsample_conv/norm3])."""

    in_planes: int
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self):
        ci, c = self.in_planes, self.planes
        convs = [_ConvParams(c, 3, ci, name="conv1")(),
                 _ConvParams(c, 3, c, name="conv2")()]
        norms = [_NormBNParams(c, name="norm1")(),
                 _NormBNParams(c, name="norm2")()]
        if self.stride != 1:
            convs.append(_ConvParams(c, 1, ci, name="downsample_conv")())
            norms.append(_NormBNParams(c, name="norm3")())
        return convs, norms


def _packed_bn(p: jnp.ndarray, stats_img, stats_mask, eps: float,
               fuse_relu: bool, dtype) -> jnp.ndarray:
    """Eval batch norm on a packed tensor: concatenated per-branch running
    stats + affine, evaluated with exactly `Norm`'s eval expression (same
    cast points, so per-channel results are bit-identical to unpacked)."""
    sx, bx, mx, vx = stats_img
    sm, bm, mm, vm = stats_mask
    scale = jnp.concatenate([sx, sm])
    bias = jnp.concatenate([bx, bm])
    mean = jnp.concatenate([mx, mm])
    var = jnp.concatenate([vx, vm])
    inv = jax.lax.rsqrt(var + eps)
    d = dtype
    out = (p - mean.astype(d)) * inv.astype(d) * scale.astype(d) \
        + bias.astype(d)
    out = out.astype(d)
    return nn.relu(out) if fuse_relu else out


class _TiledStemParams(nn.Module):
    """Mirror of `TiledInputConv` (kernel declared over `declared_in` input
    channels; a 1-channel input stands for `declared_in` tiled copies, so
    the kernel collapses by summing the in axis — exact by linearity)."""

    features: int
    declared_in: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", kaiming_out, (7, 7, self.declared_in, self.features),
            jnp.float32)
        fan_in = self.declared_in * 49
        b = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: torch_bias_init(
                key, shape, dtype, fan_in),
            (self.features,), jnp.float32)
        return k, b


def _packed_stem(x: jnp.ndarray, mask: jnp.ndarray, kx, bx, km, bm,
                 dtype) -> jnp.ndarray:
    """Both 7x7/stride-2 stems as ONE `batch_group_count=2` convolution.

    Feature group j of the output convolves batch group j of the stacked
    input with its own kernel slice, so out[..., :F] == conv(x, kx) and
    out[..., F:] == conv(mask, km) — the packed tensor is produced
    directly at full 128-lane width. Input channel counts are equalized by
    zero-padding the narrower input AND its kernel's in axis (exact)."""
    ci, cm = kx.shape[2], km.shape[2]
    c = max(ci, cm)
    if ci < c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c - ci)))
        kx = jnp.pad(kx, ((0, 0), (0, 0), (0, c - ci), (0, 0)))
    if cm < c:
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, 0), (0, c - cm)))
        km = jnp.pad(km, ((0, 0), (0, 0), (0, c - cm), (0, 0)))
    stacked = jnp.concatenate([x, mask], 0).astype(dtype)
    k = jnp.concatenate([kx, km], -1).astype(dtype)  # (7,7,c,2F)
    y = jax.lax.conv_general_dilated(
        stacked, k, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        batch_group_count=2,
        precision=jax.lax.Precision.HIGHEST)
    b = jnp.concatenate([bx, bm], -1)
    return y + b.astype(dtype)


def _packed_stem_ch(x: jnp.ndarray, mask: jnp.ndarray, kx, bx, km, bm,
                    dtype) -> jnp.ndarray:
    """Both 7x7/stride-2 stems as ONE dense conv over channel-concatenated
    inputs (`FF_PACKED_STEM=ch`, round-5 A/B): kernel block-diagonal on
    the (img channels | mask channels) input split, so out[..., :F] ==
    conv(x, kx) and out[..., F:] == conv(mask, km) exactly. Unlike the
    batch-grouped form ('1', measured loss), the batch axis is untouched
    and the image+mask tensors ride ONE input read — the stem is
    input-read-bound and the chunk input's batch-in-lanes layout pads
    channels to the sublane tile anyway (3 -> 4), so the mask channel
    rides for free. Zero kernel blocks waste FLOPs the stem doesn't have."""
    ci, cm = kx.shape[2], km.shape[2]
    f = kx.shape[3]
    xin = jnp.concatenate([x, mask], -1).astype(dtype)
    top = jnp.concatenate([kx, jnp.zeros((7, 7, ci, f), kx.dtype)], -1)
    bot = jnp.concatenate([jnp.zeros((7, 7, cm, f), km.dtype), km], -1)
    k = jnp.concatenate([top, bot], -2).astype(dtype)  # (7,7,ci+cm,2F)
    y = jax.lax.conv_general_dilated(
        xin, k, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y + jnp.concatenate([bx, bm], -1).astype(dtype)


def _blockdiag_kernel(kx: jnp.ndarray, km: jnp.ndarray) -> jnp.ndarray:
    """(kh,kw,C,C) x2 -> (kh,kw,2C,2C) with zero off-diagonal blocks:
    input block [:C] (image) feeds only output block [:C], etc."""
    kh, kw, ci, co = kx.shape
    z = jnp.zeros((kh, kw, ci, co), kx.dtype)
    top = jnp.concatenate([kx, z], -1)   # in-image row
    bot = jnp.concatenate([z, km], -1)   # in-mask row
    return jnp.concatenate([top, bot], -2)


def _packed_conv(p: jnp.ndarray, k: jnp.ndarray, b: jnp.ndarray,
                 dtype, stride: int = 1) -> jnp.ndarray:
    pad = k.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        p.astype(dtype), k.astype(dtype), (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y + b.astype(dtype)


def _packed_fusion_1x1(p: jnp.ndarray, m2i, i2m, dtype) -> jnp.ndarray:
    """Bidirectional Conv1x1 fusion on the packed tensor: one dense 1x1
    conv whose kernel is block-ANTI-diagonal (image output is fed by the
    mask input block and vice versa), exactly `img + conv(mask)` /
    `mask + conv(img)`."""
    (km2i, bm2i), (ki2m, bi2m) = m2i, i2m
    c = km2i.shape[2]
    z = jnp.zeros((1, 1, c, c), km2i.dtype)
    top = jnp.concatenate([z, ki2m], -1)   # in-image -> mask output block
    bot = jnp.concatenate([km2i, z], -1)   # in-mask  -> image output block
    k = jnp.concatenate([top, bot], -2)
    b = jnp.concatenate([bm2i, bi2m], -1)
    return p + _packed_conv(p, k, b, dtype)


def _packed_resblock(p: jnp.ndarray, params_x, params_m, stride: int,
                     norms, dtype) -> jnp.ndarray:
    """Two mirrored ResidualBlocks on one packed tensor. `norms` is either
    one callable `norm(t, relu)` used for every norm site (the param-free
    instance lowerings) or a per-site tuple (norm1, norm2[, norm3]) — the
    batch-norm path closes each site over its own affine/stats."""
    if callable(norms):
        norms = (norms,) * 3
    (k1x, b1x), (k2x, b2x) = params_x[0], params_x[1]
    (k1m, b1m), (k2m, b2m) = params_m[0], params_m[1]
    y = _packed_conv(p, _blockdiag_kernel(k1x, k1m),
                     jnp.concatenate([b1x, b1m], -1), dtype, stride)
    y = norms[0](y, True)
    y = _packed_conv(y, _blockdiag_kernel(k2x, k2m),
                     jnp.concatenate([b2x, b2m], -1), dtype)
    y = norms[1](y, True)
    if stride != 1:
        (kdx, bdx), (kdm, bdm) = params_x[2], params_m[2]
        p = _packed_conv(p, _blockdiag_kernel(kdx, kdm),
                         jnp.concatenate([bdx, bdm], -1), dtype, stride)
        p = norms[2](p, False)
    # chunked region: virtual rows of p and y are both zero, so relu(p+y)
    # stays zero there
    return nn.relu(p + y)


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

        # Manual space-to-batch over the stem+layer1 head (see module top).
        # Requires: instance norms (the wall being worked around), a
        # pixelwise fusion1 (1x1conv; SA/CA pool spatially), and an evenly
        # divisible height. Eval by default; FF_CHUNKED_FNET_TRAIN=1 also
        # chunks the TRAINING graph (exact same math — the row-chunk norm
        # path is pure jnp and differentiable; there the wall is XLA's
        # halo-masking tuple fusions around the native IN reduces rather
        # than the Pallas veto, BENCH.md Finding 4).
        nc = _row_chunk_plan(x.shape[1])
        chunked = (
            (ev or os.environ.get("FF_CHUNKED_FNET_TRAIN", "0") == "1")
            and self.norm_fn == "instance" and ft == "1x1conv"
            and nc is not None
            and os.environ.get("FF_CHUNKED_FNET", "1") != "0"
        )
        b_in = x.shape[0]
        rc = None
        if chunked:
            x = _chunk_rows(x, nc, _HALO)
            mask = _chunk_rows(mask, nc, _HALO)
            rc = (nc, _HALO // 2)  # margin halves through the stride-2 stem

        # Packed branch-pair execution through the chunked head (see the
        # `_packed_*` block above): both 64ch branches ride one 128-channel
        # tensor with block-diagonal kernels — doubled MXU lane fill,
        # measured faster than the separate chains. Param tree unchanged.
        # Eval-only: the packed convs reassociate f32 accumulation, and the
        # train-chunked gate (itself a documented negative) stays bit-stable.
        packed = chunked and ev and os.environ.get("FF_PACKED_CCE", "1") != "0"

        # Packed branch-pair execution for the BATCH-norm CCE (the fused
        # cnet in the bench config): eval batch norm is a per-channel
        # affine — no stats custom call, no cross-chunk reduction — so the
        # packed region needs no row chunking at all; the same
        # block-diagonal kernels carry both branches through
        # norm1/fusion1/layer1 at full 128-lane width. Measured at the
        # bench protocol (round 5, BENCH.md Finding 10): 35.92 vs 35.24
        # fps (+1.9%) — default on; `FF_PACKED_CCE_BN=0` opts out.
        packed_bn = (
            ev and not chunked and self.norm_fn == "batch"
            and ft == "1x1conv"
            and os.environ.get("FF_PACKED_CCE_BN", "1") != "0")

        # FF_PACKED_STEM modes (BENCH.md Findings 9/13):
        #   'ch' (DEFAULT) — both stems as one dense conv over channel-
        #     concatenated inputs (`_packed_stem_ch`): the stem is input-
        #     read-bound and the batch-in-lanes chunk layout pads channels
        #     to the sublane tile anyway, so image+mask ride one read.
        #     Measured 40.48 vs 39.60 fps (+2.2%).
        #   '1' — batch_group_count=2 form: measured LOSS (32.31 vs 33.28,
        #     round 4) — bgc denies XLA input-fusion freedom.
        #   '0' — separate stems + concat (the pre-round-5 default).
        stem_mode = os.environ.get("FF_PACKED_STEM", "ch")
        # 'ch' also serves the batch-norm (fused-cnet) packed branch — the
        # bgc form ('1') stays fnet-only as the round-4 recorded negative
        pack_stem = (os.environ.get("FF_S2D_STEM") != "1"
                     and ((packed and stem_mode in ("1", "ch"))
                          or (packed_bn and stem_mode == "ch")))
        if pack_stem:
            kx, bx = _ConvParams(64, 7, self.img_channel, name="conv1")()
            if mask.shape[-1] == 1 and self.mask_channel != 1:
                km, bm = _TiledStemParams(
                    64, self.mask_channel, name="mask_conv1")()
                # 1-channel stand-in for the tiled mask (TiledInputConv):
                # exact by linearity, sum the kernel's in axis (f32)
                km = km.sum(axis=2, keepdims=True)
            else:
                km, bm = _ConvParams(
                    64, 7, self.mask_channel, name="mask_conv1")()
            if stem_mode == "ch":
                p = _packed_stem_ch(x, mask, kx, bx, km, bm, d)
            else:
                p = _packed_stem(x, mask, kx, bx, km, bm, d)
        else:
            stem = _stem(d)
            if mask.shape[-1] == 1 and self.mask_channel != 1:
                # single-channel stand-in for a tiled mask: fold the tile
                # into the stem kernel (exact by linearity; TiledInputConv)
                mask = TiledInputConv(64, self.mask_channel,
                                      name="mask_conv1", dtype=d)(mask)
            else:
                mask = stem(64, self.mask_channel, "mask_conv1")(mask)
            x = stem(64, self.img_channel, "conv1")(x)

        if packed:
            eps = 1e-5  # Norm default; instance norm declares no params
            margin = rc[1]
            if not pack_stem:
                p = jnp.concatenate([x, mask], -1)  # [:64]=image, [64:]=mask
            p = instance_norm_rowchunks(p, nc, margin, eps, True, d)
            m2i, i2m = _FusionUnitParams(64, name="fusion1")()
            p = _packed_fusion_1x1(p, m2i, i2m, d)
            # fusion's bias re-contaminates the image-border virtual rows;
            # re-zero them so layer1's convs see the full-image zero padding
            p = zero_virtual_rows(p, nc, margin)
            norm_rc = lambda t, relu: instance_norm_rowchunks(
                t, nc, margin, eps, relu, d)
            for bi in range(2):
                px = _ResBlockParams(64, 64, 1, name=f"layer1_{bi}")()
                pm = _ResBlockParams(64, 64, 1, name=f"mask_layer1_{bi}")()
                p = _packed_resblock(p, px, pm, 1, norm_rc, d)
            # the 12-row input halo is exactly consumed by stem (3 input
            # rows) + layer1's four 3x3 convs (4 rows at /2): the chunk
            # cores are exact here — reassemble before the strided layers
            p = _unchunk_rows(p, b_in, nc, margin)
            rc = None
            # layer2 at 192 packed channels measured a LOSS (31.58 vs 32.11
            # fps at the bench protocol): 192 is not a lane-tile multiple,
            # the strided blocks add a third block-diag conv each, and the
            # mid-tile split at 96 costs a relayout. Opt-in A/B only.
            if os.environ.get("FF_PACKED_L2", "0") == "1":
                m2i, i2m = _FusionUnitParams(64, name="fusion2")()
                p = _packed_fusion_1x1(p, m2i, i2m, d)
                norm_ev = lambda t, relu: instance_norm_eval(t, eps, relu, d)
                for bi, (cin, st) in enumerate(((64, 2), (96, 1))):
                    px = _ResBlockParams(cin, 96, st, name=f"layer2_{bi}")()
                    pm = _ResBlockParams(cin, 96, st,
                                         name=f"mask_layer2_{bi}")()
                    p = _packed_resblock(p, px, pm, st, norm_ev, d)
                m2i, i2m = _FusionUnitParams(96, name="fusion3")()
                p = _packed_fusion_1x1(p, m2i, i2m, d)
                x, mask = p[..., :96], p[..., 96:]
                packed_done = 2
            else:
                x, mask = p[..., :64], p[..., 64:]
                mask, x = FusionUnit(64, ft, True, name="fusion2",
                                     dtype=d)(mask, x)
                packed_done = 1
        elif packed_bn:
            eps = 1e-5  # Norm default; the BN mirrors declare scale/bias
            if not pack_stem:
                p = jnp.concatenate([x, mask], -1)  # [:64]=image, [64:]=mask
            p = _packed_bn(p, _NormBNParams(64, name="norm1")(),
                           _NormBNParams(64, name="mask_norm1")(),
                           eps, True, d)
            m2i, i2m = _FusionUnitParams(64, name="fusion1")()
            p = _packed_fusion_1x1(p, m2i, i2m, d)

            def _bn_site(sx, sm):
                return lambda t, relu: _packed_bn(t, sx, sm, eps, relu, d)

            for bi in range(2):
                cx, nx = _ResBlockBNParams(64, 64, 1, name=f"layer1_{bi}")()
                cm, nm = _ResBlockBNParams(
                    64, 64, 1, name=f"mask_layer1_{bi}")()
                p = _packed_resblock(
                    p, cx, cm, 1,
                    tuple(_bn_site(a, b) for a, b in zip(nx, nm)), d)
            x, mask = p[..., :64], p[..., 64:]
            mask, x = FusionUnit(64, ft, True, name="fusion2",
                                 dtype=d)(mask, x)
            packed_done = 1
        else:
            mask = Norm(self.norm_fn, 64, 8, name="mask_norm1", dtype=d)(mask, ura, fuse_relu=True, is_eval=ev, row_chunks=rc)
            x = Norm(self.norm_fn, 64, 8, name="norm1", dtype=d)(x, ura, fuse_relu=True, is_eval=ev, row_chunks=rc)
            mask, x = FusionUnit(64, ft, True, name="fusion1", dtype=d)(mask, x)
            if rc is not None:
                # see the packed branch's re-zero comment
                mask = zero_virtual_rows(mask, nc, rc[1])
                x = zero_virtual_rows(x, nc, rc[1])

        dims = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
        for li, (cin, cout, stride) in enumerate(dims, start=1):
            if (packed or packed_bn) and li <= packed_done:
                continue  # executed above on the packed tensor
            mask = ResidualBlock(cin, cout, self.norm_fn, stride, name=f"mask_layer{li}_0", dtype=d)(mask, ura, is_eval=ev, row_chunks=rc)
            mask = ResidualBlock(cout, cout, self.norm_fn, 1, name=f"mask_layer{li}_1", dtype=d)(mask, ura, is_eval=ev, row_chunks=rc)
            x = ResidualBlock(cin, cout, self.norm_fn, stride, name=f"layer{li}_0", dtype=d)(x, ura, is_eval=ev, row_chunks=rc)
            x = ResidualBlock(cout, cout, self.norm_fn, 1, name=f"layer{li}_1", dtype=d)(x, ura, is_eval=ev, row_chunks=rc)
            if rc is not None and li == 1:
                # see the packed branch's unchunk comment
                mask = _unchunk_rows(mask, b_in, nc, rc[1])
                x = _unchunk_rows(x, b_in, nc, rc[1])
                rc = None
            mask, x = FusionUnit(cout, ft, True, name=f"fusion{li + 1}", dtype=d)(mask, x)

        mask = conv2d(self.output_dim, 1, 1, 0, name="mask_conv2", dtype=d, in_features=128)(mask)
        x = conv2d(self.output_dim, 1, 1, 0, name="conv2", dtype=d, in_features=128)(x)

        mask, x = FusionUnit(self.output_dim, ft, False, name="fusion5", dtype=d)(mask, x)

        if train and self.dropout > 0:
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2), deterministic=False)(x)
        return x
