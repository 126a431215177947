"""Coordinate grids and align-corners bilinear resizing.

TPU-native NHWC equivalents of the reference's coordinate utilities
(`/root/reference/core/utils/utils.py:74-82`): `coords_grid` builds the (x, y)
pixel grid that RAFT uses to represent flow as a coordinate difference, and
`upflow8` is the 8x bilinear (align_corners=True) flow upsampler used by the
small-model path.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def coords_grid(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel coordinate grid, shape (batch, ht, wd, 2) with (x, y) channel order."""
    ys = jnp.arange(ht, dtype=dtype)
    xs = jnp.arange(wd, dtype=dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([grid_x, grid_y], axis=-1)  # (H, W, 2), x first
    return jnp.broadcast_to(grid[None], (batch, ht, wd, 2))


def _ac_weights(out_size: int, in_size: int, dtype):
    """1-D align-corners source positions -> (lo index, hi index, hi weight)."""
    if out_size == 1 or in_size == 1:
        src = jnp.zeros((out_size,), dtype)
    else:
        src = jnp.arange(out_size, dtype=dtype) * ((in_size - 1) / (out_size - 1))
    lo = jnp.clip(jnp.floor(src), 0, in_size - 1).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w_hi = src - lo.astype(dtype)
    return lo, hi, w_hi


def resize_bilinear_align_corners(x: jnp.ndarray, new_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) with torch `align_corners=True` semantics.

    XLA-friendly: two axis-separable gathers with static indices, so it lowers
    to cheap takes + fused multiplies rather than a generic gather.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    nh, nw = new_hw
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    x = x.astype(dtype)

    lo, hi, wh = _ac_weights(nh, h, dtype)
    x = x[:, lo] * (1 - wh)[None, :, None, None] + x[:, hi] * wh[None, :, None, None]
    lo, hi, wh = _ac_weights(nw, w, dtype)
    x = x[:, :, lo] * (1 - wh)[None, None, :, None] + x[:, :, hi] * wh[None, None, :, None]
    return x[0] if squeeze else x


def resize_bilinear(x: jnp.ndarray, new_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (torch `align_corners=False`).

    Matches `F.interpolate(mode='bilinear', align_corners=False)` used by the
    reference's ChannelProject (`ff-raft/FF_RAFT_Core/raft.py:34`) and the
    PWC preprocess resize (`ff-pwcnet/PWCNet_Core/pwcnet.py:234-244`).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    nh, nw = new_hw
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    x = x.astype(dtype)

    def half_pixel(out_size, in_size):
        src = (jnp.arange(out_size, dtype=dtype) + 0.5) * (in_size / out_size) - 0.5
        src = jnp.clip(src, 0, in_size - 1)
        lo = jnp.clip(jnp.floor(src), 0, in_size - 1).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_size - 1)
        w_hi = src - lo.astype(dtype)
        return lo, hi, w_hi

    lo, hi, wh = half_pixel(nh, h)
    x = x[:, lo] * (1 - wh)[None, :, None, None] + x[:, hi] * wh[None, :, None, None]
    lo, hi, wh = half_pixel(nw, w)
    x = x[:, :, lo] * (1 - wh)[None, None, :, None] + x[:, :, hi] * wh[None, None, :, None]
    return x[0] if squeeze else x


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """8x upsample of an NHWC flow field, scaling values by 8.

    Equivalent of the reference `upflow8` (`core/utils/utils.py:80-82`).
    """
    _, h, w, _ = flow.shape
    return 8.0 * resize_bilinear_align_corners(flow, (8 * h, 8 * w))


def forward_interpolate(flow):
    """Forward-splat a (H, W, 2) flow field for warm-starting the next frame.

    Equivalent of the reference `forward_interpolate`
    (`core/utils/utils.py:26-54`): scatter each pixel's flow to its target
    location and fill holes by nearest-neighbor interpolation. Host-side
    (numpy/scipy) — used between video frames at evaluation time, not in the
    jitted path.
    """
    import numpy as np
    from scipy import interpolate as _interp

    flow = np.asarray(flow)
    dx, dy = flow[..., 0], flow[..., 1]
    ht, wd = dx.shape
    x0, y0 = np.meshgrid(np.arange(wd), np.arange(ht))

    x1 = (x0 + dx).reshape(-1)
    y1 = (y0 + dy).reshape(-1)
    dxf = dx.reshape(-1)
    dyf = dy.reshape(-1)

    valid = (x1 > 0) & (x1 < wd) & (y1 > 0) & (y1 < ht)
    x1, y1, dxf, dyf = x1[valid], y1[valid], dxf[valid], dyf[valid]

    flow_x = _interp.griddata((x1, y1), dxf, (x0, y0), method="nearest", fill_value=0)
    flow_y = _interp.griddata((x1, y1), dyf, (x0, y0), method="nearest", fill_value=0)
    return np.stack([flow_x, flow_y], axis=-1).astype(np.float32)
