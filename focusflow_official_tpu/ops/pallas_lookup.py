"""Fused Pallas TPU kernel for the correlation-pyramid window lookup.

Replaces RAFT's per-iteration bilinear window sampling
(`/root/reference/core/models/ff-raft/FF_RAFT_Core/corr.py:29-50`) and the
on-demand `alt_cuda_corr` contract (`corr.py:63-91`). The CUDA kernels are
per-thread gathers; TPUs have no hardware gather, so the op is restructured
around two facts:

1. The (2r+1)^2 window offsets are *consecutive integers*, so every tap of
   the bilinear sample shares one fractional part (fx, fy) per query. The
   whole window therefore reduces to a single integer-aligned
   (2r+2)x(2r+2) patch extraction followed by a 4-tap blend:

       out[j, i] = (1-fy)(1-fx) P[j, i]   + (1-fy) fx P[j, i+1]
                 +     fy (1-fx) P[j+1, i] +    fy  fx P[j+1, i+1]

2. grid_sample's zero padding becomes *geometry*: each query block is
   staged into a VMEM scratch with a 16-wide zero margin, and the clamped
   patch start lands fully inside the margin exactly when the window is out
   of range — no per-tap validity masks in the hot loop.

Layout: one kernel invocation per pyramid level, grid (B, Q/TQ). The
per-query inner loop is only the *integer* patch extraction (an 8-aligned
24-row slab load + a dynamic sublane rotate); the bilinear 4-tap blend runs
vectorized over the whole query tile afterwards. Cost: streams each level
once per call (HBM-bound) + a handful of VPU ops per query — vs. the
tent-matmul path's 2 MXU passes per query at 7% output-lane utilization.

The backward pass (training) is a `custom_vjp` that differentiates the
numerically-equivalent tent-weight einsum formulation (`ops/corr.py::
_lookup_level_mxu`) — dense MXU work, no scatter needed.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 16  # zero margin; must be >= K+1 so clamped fully-out patches read zeros
SLAB = 24  # 8-aligned row slab covering any (K+1<=10)-row window (10+7 <= 24)


def pallas_lookup_supported() -> bool:
    """Fused Pallas lookup availability (TPU backend, not opted out)."""
    if os.environ.get("FF_DISABLE_PALLAS_LOOKUP"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pick_tq(q: int) -> int:
    for tq in (32, 16, 8, 4, 2):
        if q % tq == 0:
            return tq
    return 1


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def _level_kernel(rs_ref, cs_ref, fx_ref, fy_ref, c_ref, o_ref, scratch, pbuf,
                  *, tq: int, k: int, h2: int, w2: int):
    """One (B, Q-tile) grid step.

    rs/cs: scalar-prefetch (B, Q) int32 patch starts (padded coords).
    fx/fy: (1, 1, TQ, 1) blocks of the bilinear fractional parts.
    """
    bi = pl.program_id(0)
    qt = pl.program_id(1)

    @pl.when((bi == 0) & (qt == 0))
    def _zero_margins():
        scratch[...] = jnp.zeros_like(scratch)

    # interior overwrite is the same region every step, so margins stay zero
    scratch[:, PAD : PAD + h2, PAD : PAD + w2] = c_ref[0].astype(jnp.float32)

    w2p = scratch.shape[2]

    def body(q, _):
        qg = qt * tq + q
        rs = rs_ref[bi, qg]
        cs = cs_ref[bi, qg]
        rs8 = (rs // 8) * 8  # dynamic sublane starts must be 8-aligned
        slab = scratch[q, pl.ds(rs8, SLAB), :]  # (SLAB, W2P)
        slab = pltpu.roll(slab, SLAB - (rs - rs8), axis=0)[: k + 1]
        p = pltpu.roll(slab, w2p - cs, axis=1)[:, : k + 1]
        pbuf[q] = p
        return 0

    jax.lax.fori_loop(0, tq, body, 0)

    fx = fx_ref[0, 0][:, :, None]  # (TQ, 1, 1)
    fy = fy_ref[0, 0][:, :, None]
    p = pbuf[...]
    o_ref[0] = (
        (1.0 - fy) * (1.0 - fx) * p[:, :k, :k]
        + (1.0 - fy) * fx * p[:, :k, 1:]
        + fy * (1.0 - fx) * p[:, 1:, :k]
        + fy * fx * p[:, 1:, 1:]
    )


def _lookup_level_pallas(corr_l, coords_l, radius: int, interpret: bool):
    """corr_l: (B, Q, H2, W2); coords_l: (B, Q, 2) at this level's scale.

    Returns (B, Q, K, K) with window rows = y-offset, cols = x-offset.
    """
    b, q, h2, w2 = corr_l.shape
    k = 2 * radius + 1
    assert k + 1 <= SLAB - 7 and k + 1 <= PAD
    tq = _pick_tq(q)
    nq = q // tq
    h2p = _round8(h2 + 2 * PAD + SLAB - 8)  # slab loads may run past the cap
    w2p = -(-(w2 + 2 * PAD) // 128) * 128  # full-width lane rolls per query

    cx = coords_l[..., 0]
    cy = coords_l[..., 1]
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0).astype(jnp.float32).reshape(b, nq, tq, 1)
    fy = (cy - y0).astype(jnp.float32).reshape(b, nq, tq, 1)
    # patch start in padded scratch coords, clamped so out-of-range windows
    # land in the zero margin with correct partial alignment (see docstring)
    cs = jnp.clip(x0 - radius + PAD, 0.0, float(w2 + 2 * PAD - (k + 1)))
    rs = jnp.clip(y0 - radius + PAD, 0.0, float(h2 + 2 * PAD - (k + 1)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rs, cs as full (B, Q) SMEM arrays
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, 1, tq, 1), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, tq, 1), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, tq, h2, w2), lambda i, j, *_: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, k, k), lambda i, j, *_: (i, j, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((tq, h2p, w2p), jnp.float32),
            pltpu.VMEM((tq, k + 1, k + 1), jnp.float32),
        ],
    )
    kernel = functools.partial(_level_kernel, tq=tq, k=k, h2=h2, w2=w2)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, q, k, k), jnp.float32),
        interpret=interpret,
    )(rs.astype(jnp.int32), cs.astype(jnp.int32), fx, fy, corr_l)
    return out


def _pallas_fwd_impl(levels: Sequence[jnp.ndarray], coords, radius: int):
    b, h1, w1, _ = coords.shape
    q = h1 * w1
    k = 2 * radius + 1
    interpret = jax.default_backend() != "tpu"
    outs = []
    for i, corr_l in enumerate(levels):
        cl = (coords.reshape(b, q, 2) / (2.0 ** i)).astype(jnp.float32)
        win = _lookup_level_pallas(corr_l, cl, radius, interpret)  # (B,Q,Kj,Ki)
        # reference channel order: x-offset slow, y-offset fast (`corr.py:39-43`)
        outs.append(win.transpose(0, 1, 3, 2).reshape(b, h1, w1, k * k))
    return jnp.concatenate(outs, axis=-1)


def _mxu_reference(levels, coords, radius: int):
    from .corr import _lookup_level_mxu  # local import to avoid a cycle

    outs = [
        _lookup_level_mxu(corr_l, coords / (2.0 ** i), radius)
        for i, corr_l in enumerate(levels)
    ]
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lookup_pallas_vjp(radius: int, levels: Tuple[jnp.ndarray, ...], coords):
    return _pallas_fwd_impl(levels, coords, radius)


def _vjp_fwd(radius, levels, coords):
    return _pallas_fwd_impl(levels, coords, radius), (levels, coords)


def _vjp_bwd(radius, res, g):
    # Differentiate the dense tent-weight einsum formulation: numerically the
    # same bilinear sample, and its VJP is pure MXU work (no scatters).
    levels, coords = res
    _, vjp = jax.vjp(lambda ls, cs: _mxu_reference(ls, cs, radius), levels, coords)
    return vjp(g)


_lookup_pallas_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def lookup_corr_pyramid_pallas(levels, coords, radius: int):
    """Fused window lookup over all pyramid levels.

    levels: per-level (B, H1*W1, H2_l, W2_l) volumes; coords: (B, H1, W1, 2)
    level-0 pixel coords (x, y). Returns (B, H1, W1, L*(2r+1)^2) f32 in the
    reference CorrBlock channel order. Differentiable w.r.t. levels + coords.
    """
    return _lookup_pallas_vjp(radius, tuple(levels), coords)
