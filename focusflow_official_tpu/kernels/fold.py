"""Pallas TPU kernel: folded convc1 directly on the fused-lookup chunks.

Motivation (round-4 xprof at the bench protocol): the fused lookup's
stage-2 dots emit per-level (B, Q, K, K) chunks in {2,1,0} (row-major)
layout, but XLA's folded-convc1 dot (`nn.update.ChunkFoldedConv1x1`)
prefers its activation operand q-in-lanes and inserts a 0.44 ms relayout
copy per level — 1.77 ms/forward, the single largest formatting item.
Every XLA-level reformulation measured a tie or a loss (packed (B,Q,324)
dot, full-product block-sparse fold, einsum-order swaps — BENCH.md
Findings 1/7). This kernel instead CONSUMES the chunks in exactly the
row-major layout stage 2 produces (Pallas pins operand layouts to
row-major, which is here the layout that already exists — the pin costs
nothing) and runs the fold as one K=L*K2 MXU dot per query tile.

Math = `ChunkFoldedConv1x1`'s per-level einsum chain with f32
accumulation across levels (the XLA path accumulates in the compute
dtype; the kernel is the tighter of the two). Reference semantics:
convc1 of the motion encoder,
`/root/reference/core/models/ff-raft/FF_RAFT_Core/update.py:63-75`.

Differentiable via custom_vjp: the backward runs as plain XLA einsums
(training uses the XLA path by default anyway; the vjp keeps the kernel
safe to enable globally).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Flipped by tests to exercise the Mosaic kernel in interpret mode on CPU
# (the production gate below routes non-TPU backends to the XLA fold).
_INTERPRET = False


def pallas_fold_supported() -> bool:
    if _INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _kernel(c_ref, w_ref, b_ref, o_ref, *, levels: int):
    # c_ref: (1, TQ, L*K2) row-major; w_ref: (L*K2, cout); b_ref: (1, cout)
    acc = jnp.dot(c_ref[0], w_ref[...],
                  preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _xla_fold(packed: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
              dtype) -> jnp.ndarray:
    y = jnp.einsum("bqc,co->bqo", packed, w,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return (y + bias.astype(jnp.float32)).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fold(packed: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray, dtype):
    return _fold_fwd_impl(packed, w, bias, dtype)


def _fold_fwd_impl(packed, w, bias, dtype):
    b, q, cin = packed.shape
    cout = w.shape[-1]
    tq = 512
    pad = (-q) % tq
    x = jnp.pad(packed, ((0, 0), (0, pad), (0, 0))) if pad else packed
    nq = (q + pad) // tq
    out = pl.pallas_call(
        functools.partial(_kernel, levels=4),
        out_shape=jax.ShapeDtypeStruct((b, q + pad, cout), dtype),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, tq, cin), lambda i, j: (i, j, 0)),
            pl.BlockSpec((cin, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, cout), lambda i, j: (i, j, 0)),
        interpret=_INTERPRET,
    )(x, w, bias.reshape(1, cout))
    return out[:, :q] if pad else out


def _fold_fwd(packed, w, bias, dtype):
    return _fold(packed, w, bias, dtype), (packed, w)


def _fold_bwd(dtype, res, g):
    packed, w = res
    gf = g.astype(jnp.float32)
    dpacked = jnp.einsum("bqo,co->bqc", gf, w.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST
                         ).astype(packed.dtype)
    dw = jnp.einsum("bqc,bqo->co", packed.astype(jnp.float32), gf,
                    precision=jax.lax.Precision.HIGHEST).astype(w.dtype)
    dbias = jnp.sum(gf, axis=(0, 1))
    return dpacked, dw, dbias


_fold.defvjp(_fold_fwd, _fold_bwd)


def fold_full_conv(o_full: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                   dtype, levels: int, k: int) -> jnp.ndarray:
    """convc1 over the FULL (B, Q, LK, LK) stage-2 product.

    Consumer half of `ops.corr` FF_STAGE2_FULLFOLD (round-5 Finding 12):
    the (LK*LK, cout) fold matrix is the reference convc1 weight scattered
    onto the level-diagonal (K, K) blocks — row (l*K+j)*LK + (l*K+i) holds
    w[l*K2 + i*K + j] and every cross-level row is ZERO, so the spurious
    cross-level products in o_full are multiplied away. Math identical to
    `fold_chunks_conv` on the per-level chunks (the extra contraction
    terms are exact zeros); FLOP cost is 4x a trivially small dot.
    """
    import numpy as np

    lk = levels * k
    b, q = o_full.shape[:2]
    rows = np.zeros((lk * lk,), dtype=np.int64)
    sel = np.zeros((lk * lk, 1), dtype=np.float32)
    for l in range(levels):
        for j in range(k):
            for i in range(k):
                rr = (l * k + j) * lk + (l * k + i)
                rows[rr] = l * k * k + i * k + j
                sel[rr] = 1.0
    wp = (w[jnp.asarray(rows)] * jnp.asarray(sel)).astype(dtype)  # (LK2, cout)
    packed = o_full.astype(dtype).reshape(b, q, lk * lk)
    if not pallas_fold_supported():
        return _xla_fold(packed, wp, bias, dtype)
    return _fold(packed, wp, bias.astype(dtype), dtype)


def fold_chunks_conv(chunks: Tuple[jnp.ndarray, ...], w: jnp.ndarray,
                     bias: jnp.ndarray, dtype) -> jnp.ndarray:
    """convc1 over query-space lookup chunks, chunk-layout-native.

    chunks: L tensors (B, Q, K, K) in (j, i) order from
    `lookup_corr_fused_chunks`; w: (L*K*K, cout) in REFERENCE row order
    (l, then i slow, j fast); bias: (cout,).
    """
    levels = len(chunks)
    b, q, k, _ = chunks[0].shape
    cout = w.shape[-1]
    # reference rows (l, i, j) -> chunk-flatten order (l, j, i); the
    # permutation is loop-invariant and folds into the weights.
    idx = [l * k * k + i * k + j
           for l in range(levels) for j in range(k) for i in range(k)]
    wp = w[jnp.asarray(idx)].astype(dtype)  # (L*K2, cout)
    packed = jnp.concatenate(
        [ch.astype(dtype).reshape(b, q, k * k) for ch in chunks], axis=-1)
    if not pallas_fold_supported():
        return _xla_fold(packed, wp, bias, dtype)
    return _fold(packed, wp, bias.astype(dtype), dtype)
