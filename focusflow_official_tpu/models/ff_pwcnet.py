"""FF-PWCNet: keypoint-conditioned PWC-Net (and the vanilla PWCNET).

TPU-native redesign of `/root/reference/core/models/ff-pwcnet/PWCNet_Core/
{pwcnet.py,ff_pwcnet.py}`:

- NHWC layout; the reference's CUDA/CuPy cost-volume kernel becomes the
  fused XLA `local_corr` (`ops/local_corr.py`) — autodiff replaces its two
  hand-written backward kernels;
- inputs resize to a /64 multiple (bilinear, half-pixel) and the final flow
  rescales back at test time, exactly like the reference `preprocess`;
- FF mode applies the mask modalities AFTER the resize (`ff_pwcnet.py:406-408`)
  and feeds raw 0-255 images (the reference does not normalize PWC inputs);
- the coarse-to-fine chain (levels 6->2) is a fixed 5-stage unrolled graph —
  perfectly XLA-friendly (static shapes per level).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.pwc import PWCDecoder, PWCExtractor, PWCFusionExtractor, PWCRefiner
from ..ops.coords import resize_bilinear
from .config import FFRaftConfig  # reuse mask-modal fields
from .mask_modal import init_mask


def _pwc_resize(x: jnp.ndarray, new_hw) -> jnp.ndarray:
    return resize_bilinear(x, new_hw)


def _padded_size(h: int, w: int) -> tuple[int, int]:
    return ((h + 63) // 64) * 64, ((w + 63) // 64) * 64


class PWCNet(nn.Module):
    """Vanilla PWC-Net (`pwcnet.py:43-274`). Set `fusion_type` via FFPWCNet
    for the conditioned variant."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image1, image2, mask1=None, mask2=None, iters=None,
                 test_mode: bool = False, train: bool = False):
        d = self.dtype
        _, h, w, _ = image1.shape
        nh, nw = _padded_size(h, w)
        ten_one = _pwc_resize(image1, (nh, nw)).astype(d)
        ten_two = _pwc_resize(image2, (nh, nw)).astype(d)

        ext = PWCExtractor(name="netExtractor", dtype=d)
        feats1 = ext(ten_one)
        feats2 = ext(ten_two)
        return _decode(self, feats1, feats2, (h, w), (nh, nw), test_mode, d)


class FFPWCNet(nn.Module):
    """FF_PWCNET (`ff_pwcnet.py:113-435`): CCE extractor + mask modalities."""

    cfg: FFRaftConfig

    @nn.compact
    def __call__(self, image1, image2, mask1=None, mask2=None, iters=None,
                 test_mode: bool = False, train: bool = False):
        cfg = self.cfg
        d = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        _, h, w, _ = image1.shape
        nh, nw = _padded_size(h, w)

        ten_one = _pwc_resize(image1, (nh, nw))
        ten_two = _pwc_resize(image2, (nh, nw))
        mask1 = _pwc_resize(mask1, (nh, nw))
        mask2 = _pwc_resize(mask2, (nh, nw))
        mask1, mask2 = init_mask(
            ten_one, ten_two, mask1, mask2,
            mask_modal=cfg.mask_modal, mask_channel=cfg.mask_channel,
            mask_dilate=cfg.mask_dilate, kernel_size=cfg.kernel_size,
            kernel_sigma=cfg.kernel_sigma,
        )

        ext = PWCFusionExtractor(fusion_type=cfg.fusion_type, name="netExtractor", dtype=d)
        feats1 = ext(ten_one.astype(d), mask1.astype(d))
        feats2 = ext(ten_two.astype(d), mask2.astype(d))
        return _decode(self, feats1, feats2, (h, w), (nh, nw), test_mode, d)


def _decode(parent, feats1, feats2, orig_hw, new_hw, test_mode, d):
    """Coarse-to-fine decoding + refiner (`pwcnet.py:247-272`)."""
    h, w = orig_hw
    nh, nw = new_hw

    names = {6: "netSix", 5: "netFiv", 4: "netFou", 3: "netThr", 2: "netTwo"}
    prev = None
    flow_list = []
    for lvl, idx in ((6, 5), (5, 4), (4, 3), (3, 2), (2, 1)):
        flow, feat = PWCDecoder(lvl, name=names[lvl], dtype=d, parent=parent)(
            feats1[idx], feats2[idx], prev
        )
        prev = (flow, feat)
        flow_list.insert(0, flow)
    refiner = PWCRefiner(name="netRefiner", dtype=d, parent=parent)
    refined = flow_list[0] + refiner(prev[1])
    flow_list[0] = refined

    if test_mode:
        out = resize_bilinear(refined.astype(jnp.float32), (h, w))
        out = out * jnp.array([w / nw, h / nh], jnp.float32)
        return out
    return [f.astype(jnp.float32) for f in flow_list]
