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
import jax.numpy as jnp

from .blocks import ResidualBlock, TiledInputConv, conv2d, _stem
from .fusion_units import FusionUnit
from .norm import Norm, zero_virtual_rows

# Manual space-to-batch for the stem+layer1 head (eval only): XLA's own
# space-to-batch conv rewrite — worth 2.4x on the low-channel convs
# (BENCH.md Finding 4) — is vetoed by the Pallas IN-stats custom call.
# Chunking the rows OURSELVES with a 12-row halo gives the convs a big
# batch without XLA's pass, and the instance norms compute exact global
# stats from the disjoint chunk cores (`Norm(row_chunks=...)`), so no
# custom call is needed in the chunked region at all.
_HALO = 12  # input rows each side: stem 7x7/2 (3) + 4x conv3x3 at /2 (2*4), rounded even


def _row_chunk_plan(h: int):
    """Pick nc so H/2 splits into equal cores of 40-64 rows (then 20-39).

    FF_CHUNK_NC forces a specific chunk count (perf experiments only;
    rejected if it doesn't divide H/2)."""
    h2 = h // 2
    forced = os.environ.get("FF_CHUNK_NC")
    if forced:
        nc = int(forced)
        return nc if nc > 1 and h2 % nc == 0 else None
    for lo, hi in ((40, 65), (20, 40)):
        for ch2 in range(lo, hi):
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

        stem = _stem(d)
        if mask.shape[-1] == 1 and self.mask_channel != 1:
            # single-channel stand-in for a tiled mask: fold the tile into
            # the stem kernel (exact by linearity; see TiledInputConv)
            mask = TiledInputConv(64, self.mask_channel,
                                  name="mask_conv1", dtype=d)(mask)
        else:
            mask = stem(64, self.mask_channel, "mask_conv1")(mask)
        mask = Norm(self.norm_fn, 64, 8, name="mask_norm1", dtype=d)(mask, ura, fuse_relu=True, is_eval=ev, row_chunks=rc)

        x = stem(64, self.img_channel, "conv1")(x)
        x = Norm(self.norm_fn, 64, 8, name="norm1", dtype=d)(x, ura, fuse_relu=True, is_eval=ev, row_chunks=rc)

        mask, x = FusionUnit(64, ft, True, name="fusion1", dtype=d)(mask, x)
        if rc is not None:
            # fusion's bias re-contaminates the image-border virtual rows;
            # re-zero them so layer1's convs see the full-image zero padding
            mask = zero_virtual_rows(mask, nc, rc[1])
            x = zero_virtual_rows(x, nc, rc[1])

        dims = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
        for li, (cin, cout, stride) in enumerate(dims, start=1):
            mask = ResidualBlock(cin, cout, self.norm_fn, stride, name=f"mask_layer{li}_0", dtype=d)(mask, ura, is_eval=ev, row_chunks=rc)
            mask = ResidualBlock(cout, cout, self.norm_fn, 1, name=f"mask_layer{li}_1", dtype=d)(mask, ura, is_eval=ev, row_chunks=rc)
            x = ResidualBlock(cin, cout, self.norm_fn, stride, name=f"layer{li}_0", dtype=d)(x, ura, is_eval=ev, row_chunks=rc)
            x = ResidualBlock(cout, cout, self.norm_fn, 1, name=f"layer{li}_1", dtype=d)(x, ura, is_eval=ev, row_chunks=rc)
            if rc is not None and li == 1:
                # the 12-row input halo is exactly consumed by stem (3 input
                # rows) + layer1's four 3x3 convs (4 rows at /2): the chunk
                # cores are exact here — reassemble before the strided layers
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
