"""PWC-Net building blocks (NHWC flax): extractor, CCE extractor, decoder, refiner.

Equivalents of the reference PWCNET internals
(`/root/reference/core/models/ff-pwcnet/PWCNet_Core/pwcnet.py:43-231`) and
the FF_PWCNET CCE extractor (`ff_pwcnet.py:123-266`): a 6-level conv
pyramid (16/32/64/96/128/196), coarse-to-fine DenseNet-style decoders fed
by the 81-channel local cost volume, and a dilated-conv context refiner.
Module names mirror the torch attribute names (netOne_0 = netOne.0 ...) for
checkpoint import.

Init: torch Conv2d DEFAULTS (`blocks.torch_default`), because the reference
PWC family has no init loop (unlike the RAFT extractor's kaiming loop).
This matters: kaiming fan-out through the DenseNet flow heads amplifies the
init-time flow ~20x per level and the coarse-to-fine feedback compounds it
to ~1e8 px, after which training collapses into an input-insensitive
predict-the-mean minimum (round-3 finding; `tests/test_pwc_init.py`).
FusionUnit convs (shared with the RAFT CCE) keep kaiming fan-out — a
documented deviation; they sit in the feature path, not the flow feedback.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.local_corr import local_corr
from ..ops.warp import backwarp
from .blocks import conv2d, conv_transpose2d, torch_default
from .fusion_units import FusionUnit

_LEVEL_DIMS = [16, 32, 64, 96, 128, 196]
_LEVEL_NAMES = ["netOne", "netTwo", "netThr", "netFou", "netFiv", "netSix"]


def lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def _stage(parent_compact_self, x, out_dim: int, prefix: str, dtype):
    """One extractor stage: 3x (conv + leaky-relu), first conv stride 2.

    Plain function so conv params sit directly on the caller's scope with
    torch-compatible names (netOne_0 = netOne.0, ...).
    """
    ki = torch_default
    x = lrelu(conv2d(out_dim, 3, 2, 1, name=f"{prefix}_0", dtype=dtype, kernel_init=ki)(x))
    x = lrelu(conv2d(out_dim, 3, 1, 1, name=f"{prefix}_2", dtype=dtype, kernel_init=ki)(x))
    x = lrelu(conv2d(out_dim, 3, 1, 1, name=f"{prefix}_4", dtype=dtype, kernel_init=ki)(x))
    return x


class PWCExtractor(nn.Module):
    """6-level feature pyramid (`pwcnet.py:47-115`)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        feats = []
        for dim, name in zip(_LEVEL_DIMS, _LEVEL_NAMES):
            x = _stage(self, x, dim, name, self.dtype)
            feats.append(x)
        return tuple(feats)


class PWCFusionExtractor(nn.Module):
    """CCE extractor: mirrored mask stages + per-level FusionUnit
    (fusion1-5 bidirectional, fusion6 uni — `ff_pwcnet.py:123-266`)."""

    fusion_type: str = "1x1conv"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        d = self.dtype
        feats = []
        for i, (dim, name) in enumerate(zip(_LEVEL_DIMS, _LEVEL_NAMES)):
            x = _stage(self, x, dim, name, d)
            mask = _stage(self, mask, dim, f"mask_{name}", d)
            bi = i < 5
            mask, x = FusionUnit(dim, self.fusion_type, bi, name=f"fusion{i + 1}", dtype=d)(mask, x)
            feats.append(x)
        return tuple(feats)


# channel bookkeeping from `pwcnet.py:122-127`
_BACKWARP_SCALE = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}


class PWCDecoder(nn.Module):
    """One coarse-to-fine level (`pwcnet.py:118-194`): upsample prev
    flow/feat (ConvTranspose 4x4/2), warp level-2 features, 81-ch local
    cost volume, DenseNet conv stack -> 2-ch flow."""

    level: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ten_one, ten_two, prev: Optional[Tuple[jnp.ndarray, jnp.ndarray]]):
        d = self.dtype
        ten_one = ten_one.astype(d)
        ten_two = ten_two.astype(d)

        if prev is None:
            volume = lrelu(local_corr(ten_one, ten_two, radius=4).astype(d))
            feat = volume
        else:
            prev_flow, prev_feat = prev
            flow = conv_transpose2d(2, name="netUpflow", dtype=d,
                                    kernel_init=torch_default)(prev_flow)
            feat_up = conv_transpose2d(2, name="netUpfeat", dtype=d,
                                       kernel_init=torch_default)(prev_feat)
            warped = backwarp(ten_two, (flow * _BACKWARP_SCALE[self.level]).astype(jnp.float32))
            volume = lrelu(local_corr(ten_one, warped.astype(d), radius=4).astype(d))
            feat = jnp.concatenate([volume, ten_one, flow, feat_up], axis=-1)

        for name, c in (("netOne", 128), ("netTwo", 128), ("netThr", 96),
                        ("netFou", 64), ("netFiv", 32)):
            y = lrelu(conv2d(c, 3, 1, 1, name=f"{name}_0", dtype=d,
                             kernel_init=torch_default)(feat))
            feat = jnp.concatenate([y, feat], axis=-1)
        flow_out = conv2d(2, 3, 1, 1, name="netSix_0", dtype=d,
                          kernel_init=torch_default)(feat)
        return flow_out, feat


class PWCRefiner(nn.Module):
    """Dilated context network (`pwcnet.py:196-220`)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        x = feat.astype(d)
        spec = [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1), (2, 1)]
        for i, (c, dil) in enumerate(spec):
            x = nn.Conv(
                c, (3, 3), strides=(1, 1),
                padding=((dil, dil), (dil, dil)), kernel_dilation=(dil, dil),
                kernel_init=torch_default, dtype=d, param_dtype=jnp.float32,
                precision=jax.lax.Precision.HIGHEST, name=f"netMain_{2 * i}",
            )(x)
            if i < len(spec) - 1:
                x = lrelu(x)
        return x
