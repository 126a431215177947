"""Backward warping by optical flow (PWC-Net style, NHWC).

Equivalent of the reference `backwarp`
(`/root/reference/core/models/ff-pwcnet/PWCNet_Core/pwcnet.py:19-39`),
including its quirks: the sampling grid uses align_corners=False pixel
centers while the flow is normalized by (size-1)/2, so the effective sample
position is `x + u * W/(W-1)` (NOT `x + u`); a ones-channel is warped
alongside and thresholded at 0.999 to zero out-of-view pixels.
"""

from __future__ import annotations

import jax.numpy as jnp

from .sampler import bilinear_sample


def backwarp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp `img` (B, H, W, C) backward by `flow` (B, H, W, 2) (u, v)."""
    b, h, w, c = img.shape
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")

    # reference's mixed normalization: flow scaled by size/(size-1)
    px = gx[None] + flow[..., 0] * (w / (w - 1.0))
    py = gy[None] + flow[..., 1] * (h / (h - 1.0))
    coords = jnp.stack([px, py], axis=-1)

    ones = jnp.ones((b, h, w, 1), img.dtype)
    out = bilinear_sample(jnp.concatenate([img, ones], axis=-1), coords)
    warped, alpha = out[..., :c], out[..., c:]
    mask = (alpha > 0.999).astype(img.dtype)
    return warped * mask
