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


def depth_to_space_flow(up: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """(..., H, W, f*f, 2) -> (..., f*H, f*W, 2); subpixel index s = a*f + b.

    Kept OUT of the refinement scan: per-iteration 6-D depth-to-space
    transposes cost ~13 ms/step in layout copies (round-3 xprof); one big
    rearrange over the stacked iterations is a single copy.
    """
    *lead, h, w, ff, c = up.shape
    f = factor
    up = up.reshape(*lead, h, w, f, f, c)
    n = len(lead)
    perm = tuple(range(n)) + (n, n + 2, n + 1, n + 3, n + 4)
    return up.transpose(perm).reshape(*lead, f * h, f * w, c)


def _convex_upsample_impl(flow: jnp.ndarray, mask: jnp.ndarray, f: int) -> jnp.ndarray:
    b, h, w, _ = flow.shape
    # (B, H, W, 9, f*f): contiguous reshape of the (k, a, b) channel layout,
    # keeping the f*f=64 subpixel axis MINOR — a 6-D (..., 9, 8, 8) softmax
    # output forced XLA into tile-unfriendly layouts that cost ~35 ms/step of
    # pure copies in the training scan (round-3 xprof, BENCH.md).
    m = jax.nn.softmax(mask.reshape(b, h, w, 9, f * f), axis=3)

    fp = jnp.pad(flow * float(f), ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 9-term FMA over the neighbors instead of stacking an unfold: each term
    # broadcasts a (B, H, W, 1) shifted-flow component over the 64 subpixel
    # lanes — one elementwise fusion, no (B, H, W, 9, 2) stack (whose 9
    # (B,H,W,1,2) broadcast copies cost ~1.75 ms EACH in the scan body).
    acc_x = jnp.zeros((b, h, w, f * f), m.dtype)
    acc_y = jnp.zeros((b, h, w, f * f), m.dtype)
    for k in range(9):
        ki, kj = divmod(k, 3)
        nb = fp[:, ki : ki + h, kj : kj + w, :]
        wk = m[:, :, :, k, :]
        acc_x = acc_x + wk * nb[..., 0:1]
        acc_y = acc_y + wk * nb[..., 1:2]
    return jnp.stack([acc_x, acc_y], axis=-1)  # (B, H, W, f*f, 2)


def convex_upsample_flat(flow: jnp.ndarray, mask: jnp.ndarray,
                         factor: int = 8) -> jnp.ndarray:
    """`convex_upsample` without the final depth-to-space: (B, H, W, f*f, 2).

    The training scan emits this compact form and `depth_to_space_flow`
    runs ONCE on the stacked iterations afterwards.

    Rematerialized (`jax.checkpoint`): inside the training scan the softmaxed
    weights (39 MB/iteration at chairs shapes) would otherwise be stacked
    across iterations and re-read in the backward through layout-conversion
    copies (2x 10.5 ms/step, round-3 xprof); recomputing them from the saved
    (flow, mask) inputs is a single cheap elementwise fusion.
    """
    return jax.checkpoint(_convex_upsample_impl, static_argnums=(2,))(
        flow, mask, factor
    )


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Upsample (B, H, W, 2) flow to (B, 8H, 8W, 2) via learned convex weights.

    mask: (B, H, W, 9 * factor^2) raw logits, channel layout (k, a, b)
    row-major — identical to the torch reshape `view(N, 1, 9, 8, 8, H, W)` of
    an NCHW (N, 576, H, W) tensor.
    """
    return depth_to_space_flow(convex_upsample_flat(flow, mask, factor), factor)
