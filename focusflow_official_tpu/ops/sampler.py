"""Bilinear sampling at pixel coordinates (grid_sample equivalent).

TPU-native gather-based equivalent of the reference `bilinear_sampler`
(`/root/reference/core/utils/utils.py:57-71`), which wraps
`F.grid_sample(align_corners=True, padding_mode='zeros')` over pixel
coordinates. Out-of-bounds taps contribute zero, exactly matching torch's
zero-padding bilinear semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray, return_mask: bool = False):
    """Sample `img` (B, H, W, C) at pixel coordinates `coords` (B, ..., 2) (x, y).

    Returns (B, ..., C). Zero padding for samples outside the image, computed
    per-corner so that partially-out-of-bounds samples blend with zeros like
    `F.grid_sample(..., padding_mode='zeros', align_corners=True)`.
    """
    b, h, w, c = img.shape
    batch_shape = coords.shape[:-1]
    coords = coords.reshape(b, -1, 2)
    n = coords.shape[1]

    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    img_flat = img.reshape(b, h * w, c)

    def tap(xi, yi, wgt):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yi_c * w + xi_c  # (B, N)
        vals = jnp.take_along_axis(img_flat, idx[..., None], axis=1)  # (B, N, C)
        wgt = jnp.where(valid, wgt, 0.0)
        return vals * wgt[..., None].astype(img.dtype)

    out = (
        tap(x0, y0, wx0 * wy0)
        + tap(x1, y0, wx1 * wy0)
        + tap(x0, y1, wx0 * wy1)
        + tap(x1, y1, wx1 * wy1)
    )
    out = out.reshape(*batch_shape, c)

    if return_mask:
        # In-bounds mask in the reference's strict-interior sense
        # (`core/utils/utils.py:68`): normalized coords strictly inside (-1, 1).
        xg = 2 * x / (w - 1) - 1
        yg = 2 * y / (h - 1) - 1
        mask = (xg > -1) & (yg > -1) & (xg < 1) & (yg < 1)
        return out, mask.reshape(*batch_shape).astype(img.dtype)
    return out
