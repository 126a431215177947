"""Mosaic stage-2 lookup kernel: the round-4 "in-kernel transpose" open
question, answered by experiment (BENCH.md Finding 11).

Context. The fused MXU lookup (`ops.corr.lookup_corr_fused_chunks`) runs
stage 2 as L per-level (B,Q)-batched (K,H2)@(H2,K) einsums. Its residual
tax (round-3/4 xprof): the (B, Q, 9, 9) minor dims lane-starve every XLA
formulation — stage-2 dots 2.36 ms + chunk relayout copies 1.77 ms +
sy-operand build/traffic ~1 ms per 12-iteration forward. Every XLA-level
reformulation measured a tie or loss (Findings 1/7); a Mosaic kernel of
per-query dots is DEAD by measurement (round 2: 10x slower — Mosaic
serializes small batched dots that XLA's batched-matmul lowering streams).

This kernel takes the one formulation not yet measured: keep queries in
the LANE dimension end-to-end, so the tiny K=9 window dims never touch
the lanes at all:

- the t tile (TQ queries) is transposed IN-KERNEL to q-minor (H2, LK, TQ)
  — "the in-kernel transpose is the open question" (BENCH.md round-3
  profile note);
- the sy block tents are built DIRECTLY q-minor in VMEM from the cy
  scalars (never materialized to HBM — kills the XLA sy_all build and
  its ~28 MB/iteration round trip);
- stage 2 becomes 36 broadcast-multiply + sublane-reduce passes per
  (level, j): (H2, K, TQ) * (H2, 1, TQ) -> sum_y -> (K, TQ), all at
  full 128-lane fill;
- the folded convc1 (`nn.update.ChunkFoldedConv1x1` math) fuses in: the
  (LK2, TQ) chunk stack transposes back (one (324, TQ) 2D transpose) and
  hits the MXU as (TQ, 324) @ (324, 256) — the chunks never exist in HBM.

Reference semantics: CorrBlock lookup + motion-encoder convc1,
`/root/reference/core/models/ff-raft/FF_RAFT_Core/corr.py:29-50` +
`update.py:63-75`. Math identical to lookup_corr_fused_chunks +
ChunkFoldedConv1x1 up to float association (tents f32, products
accumulated f32, chunk cast to bf16 before the fold dot — same cast
points as the XLA path).

Eval-only experiment (`FF_STAGE2_KERNEL=1`): no custom_vjp — training
keeps the XLA path ('auto' resolves per mode already).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flipped by tests to exercise the Mosaic kernel in interpret mode on CPU.
_INTERPRET = False


def stage2_kernel_supported() -> bool:
    if _INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _kernel(cy_ref, t_ref, w_ref, b_ref, o_ref, *, levels: int, radius: int,
            h2: int, sizes, transpose_in_kernel: bool, out_dtype):
    k = 2 * radius + 1
    if transpose_in_kernel:
        t = t_ref[0]  # (TQ, H2, LK) bf16
        tq = jnp.transpose(t, (1, 2, 0))  # (H2, LK, TQ) — THE transpose
    else:
        tq = t_ref[0]  # (B, H2, LK, TQ) fed pre-transposed by XLA
    tq32 = tq.astype(jnp.float32)
    cy = cy_ref[0]  # (TQ,) f32
    tqn = tq.shape[-1]

    yb_i = jax.lax.broadcasted_iota(jnp.int32, (h2, 1), 0)  # (H2, 1)
    parts = []
    for l in range(levels):
        hl = sizes[l]
        scaled = cy * (0.5 ** l)  # (TQ,)
        yb = (yb_i >> l).astype(jnp.float32)  # (H2, 1)
        base = scaled[None, :] - yb  # (H2, TQ)
        tl = tq32[:, l * k:(l + 1) * k, :]  # (H2, K, TQ)
        if hl << l < h2:  # pooled-away trailing rows get zero weight
            valid = (yb_i < (hl << l)).astype(jnp.float32)  # (H2, 1)
        else:
            valid = None
        for j in range(k):
            d_j = float(j - radius)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(base + d_j)) * (2.0 ** -l)
            if valid is not None:
                w = w * valid
            # (H2, 1, TQ) * (H2, K, TQ) -> sum_y -> (K, TQ), f32
            parts.append(jnp.sum(w[:, None, :] * tl, axis=0))
    o_all = jnp.concatenate(parts, axis=0)  # (L*K*K, TQ), rows (l, j, i)
    # fold: (TQ, LK2) @ (LK2, cout) on the MXU; chunk values cast to the
    # compute dtype exactly where ChunkFoldedConv1x1 casts them
    o_t = jnp.transpose(o_all.astype(w_ref.dtype), (1, 0))  # (TQ, LK2)
    acc = jnp.dot(o_t, w_ref[...], preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(out_dtype)


def stage2_fold(t: jnp.ndarray, cy: jnp.ndarray, wp: jnp.ndarray,
                bias: jnp.ndarray, radius: int, sizes: Sequence[int],
                dtype=jnp.bfloat16, tq: int = 128,
                transpose_in_kernel: bool = True) -> jnp.ndarray:
    """Fused stage-2 + folded-convc1.

    t: (B, Q, H2, LK) bf16 stage-1 output; cy: (B, Q) f32 level-0 query y
    coords; wp: (L*K2, cout) folded convc1 weights in chunk row order
    (l, j, i) — i.e. `w[idx]` with idx = l*K2 + i*K + j (see
    `kernels.fold.fold_chunks_conv`); bias: (cout,). sizes: per-level
    pooled heights H_l. Returns (B, Q, cout) in `dtype`.
    """
    b, q, h2, lk = t.shape
    k = 2 * radius + 1
    levels = lk // k
    cout = wp.shape[-1]
    pad = (-q) % tq
    if pad:
        t = jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))
        cy = jnp.pad(cy, ((0, 0), (0, pad)))
    nq = (q + pad) // tq

    kern = functools.partial(
        _kernel, levels=levels, radius=radius, h2=h2, sizes=tuple(sizes),
        transpose_in_kernel=transpose_in_kernel, out_dtype=dtype)
    if transpose_in_kernel:
        t_in = t
        t_spec = pl.BlockSpec((1, tq, h2, lk), lambda i, j: (i, j, 0, 0))
    else:
        t_in = jnp.transpose(t, (0, 2, 3, 1))  # (B, H2, LK, Q) via XLA
        t_spec = pl.BlockSpec((1, h2, lk, tq), lambda i, j: (i, 0, 0, j))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, q + pad, cout), dtype),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, tq), lambda i, j: (i, j)),
            t_spec,
            pl.BlockSpec((lk * k, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, cout), lambda i, j: (i, j, 0)),
        interpret=_INTERPRET,
    )(cy, t_in, wp, bias.reshape(1, cout))
    return out[:, :q] if pad else out
