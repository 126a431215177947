"""Local (windowed) cost volume — PWC-Net's 81-channel correlation.

TPU-native equivalent of the reference's CUDA/CuPy kernel
(`/root/reference/core/models/ff-pwcnet/PWCNet_Core/correlation.py:34-101`):

    out[b, y, x, (dy+r)*(2r+1)+(dx+r)] = mean_c f1[b,y,x,c] * f2[b,y+dy,x+dx,c]

with zero padding outside f2 and displacements dy, dx in [-r, r] (r=4 in
PWC-Net). Here it is expressed as 2r+1 squared shifted elementwise products —
pure XLA, fully fusable, and differentiable without a hand-written VJP (the
reference needed two backward CUDA kernels; `jax.grad` of a shift is a shift).

A Pallas kernel with a blocked VMEM formulation can replace this for the perf
pass; the math and channel ordering here are the contract it must match.
"""

from __future__ import annotations

import jax.numpy as jnp


def local_corr(fmap1: jnp.ndarray, fmap2: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
    """Windowed correlation of NHWC feature maps -> (B, H, W, (2r+1)^2).

    Channel order is dy-major then dx (reference `correlation.py:71-72`:
    s2o = ch % 9 - 4 is the x-offset, s2p = ch / 9 - 4 the y-offset).
    """
    b, h, w, c = fmap1.shape
    r = radius
    f2p = jnp.pad(fmap2, ((0, 0), (r, r), (r, r), (0, 0)))

    outs = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = f2p[:, r + dy : r + dy + h, r + dx : r + dx + w, :]
            outs.append(jnp.mean(fmap1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)
