"""Convex (learned) 8x flow upsampling.

NHWC equivalent of RAFT's `upsample_flow`
(`/root/reference/core/models/ff-raft/FF_RAFT_Core/raft.py:159-170`): each
fine pixel is a softmax-convex combination of the 3x3 coarse neighborhood of
8x the coarse flow. Expressed as one einsum so XLA maps it onto the MXU/VPU
without materializing the unfold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unfold3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 zero-padded neighborhoods of NHWC input -> (B, H, W, 9, C).

    Neighbor index k = ki*3 + kj corresponds to offset (dy=ki-1, dx=kj-1),
    matching `F.unfold(x, [3,3], padding=1)`'s channel ordering.
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    shifts = [xp[:, ki : ki + h, kj : kj + w, :] for ki in range(3) for kj in range(3)]
    return jnp.stack(shifts, axis=3)


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Upsample (B, H, W, 2) flow to (B, 8H, 8W, 2) via learned convex weights.

    mask: (B, H, W, 9 * factor^2) raw logits, channel layout (k, a, b)
    row-major — identical to the torch reshape `view(N, 1, 9, 8, 8, H, W)` of
    an NCHW (N, 576, H, W) tensor.
    """
    b, h, w, _ = flow.shape
    f = factor
    m = mask.reshape(b, h, w, 9, f, f)
    m = jax.nn.softmax(m, axis=3)

    nb = unfold3x3(flow * float(f))  # (B, H, W, 9, 2)
    up = jnp.einsum(
        "nhwkuv,nhwkc->nhwuvc", m, nb, precision=jax.lax.Precision.HIGHEST
    )  # (B, H, W, f, f, 2)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # (B, H, f, W, f, 2)
    return up.reshape(b, f * h, f * w, 2)
