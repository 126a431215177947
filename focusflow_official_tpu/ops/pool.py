"""2x2 stride-2 average pooling with torch floor semantics.

Equivalent of `F.avg_pool2d(x, 2, stride=2)` used to build the correlation
pyramid (`/root/reference/core/models/ff-raft/FF_RAFT_Core/corr.py:26`):
odd trailing rows/cols are dropped (floor output size). Implemented as a
reshape+mean, which XLA fuses into a single cheap reduction.
"""

from __future__ import annotations

import jax.numpy as jnp


def avg_pool2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Average-pool the two spatial axes of (..., H, W) or (..., H, W, C).

    Pools the last two axes if the input has no channel dim; for NHWC-style
    inputs use `avg_pool2x2_nhwc`.
    """
    h, w = x.shape[-2], x.shape[-1]
    nh, nw = h // 2, w // 2
    x = x[..., : nh * 2, : nw * 2]
    new_shape = x.shape[:-2] + (nh, 2, nw, 2)
    return x.reshape(new_shape).mean(axis=(-3, -1))


def avg_pool2x2_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """Average-pool H and W of an NHWC tensor (..., H, W, C), floor semantics."""
    h, w = x.shape[-3], x.shape[-2]
    nh, nw = h // 2, w // 2
    x = x[..., : nh * 2, : nw * 2, :]
    new_shape = x.shape[:-3] + (nh, 2, nw, 2, x.shape[-1])
    return x.reshape(new_shape).mean(axis=(-4, -2))
