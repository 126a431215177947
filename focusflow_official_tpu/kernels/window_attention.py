"""Pallas TPU kernel: fused 7x7 window ("LSA") attention, natural layout.

The FlowFormer cost perceiver's vertical-local layers
(`nn/latent_cost.py::LocallyGroupedAttnRPEContext`, reference
`.../LatentCostFormer/twins.py:229-304`) attend within ws x ws windows of
an (B, H, W, C) token grid. The XLA lowering window-partitions q/k/v with
6-D reshape/transpose pairs and merges the output back — at bench shapes
(B=8, 56x133 padded grid, C=128) the vertical-local scope measures ~6 ms
against a ~0.2 ms data roofline, all partition/merge relayouts (round-3
xprof; the round-4 FF_LSA_V2 single-big-transpose variant measured WORSE,
16.56 vs 18.41 fps — XLA cannot be talked out of this tax).

This kernel removes the permutations entirely: q/k/v are produced by the
(pointwise) denses in NATURAL (B, H, W, C) layout — they commute with
window partitioning — and the grid walks window ROWS: each program loads
(1, ws, W, C) slabs of q/k/v, slices each ws x ws window in VMEM,
computes the 49x49 head attentions there, and writes the output slab
back in natural layout. The attention matrices never touch HBM and no
XLA-side relayout exists on either side.

Padded windows are handled by construction: the caller zero-pads the
grid BEFORE its q/k/v denses (reference semantics — padded tokens carry
the dense bias), so the kernel sees exactly the values the XLA path's
windows would.

Differentiable via custom_vjp: the backward recomputes with the plain
XLA einsum formulation (standard softmax-attention VJP), mirroring
`kernels/attention.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

HIGH = jax.lax.Precision.HIGHEST

_MAX_LANES = 512


def window_attention_supported(ws: int, c: int, heads: int, w_padded: int) -> bool:
    """Shape gate: whole window rows must fit VMEM comfortably."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    row_bytes = 3 * ws * w_padded * c * 4
    return (c <= _MAX_LANES and c % heads == 0 and ws * ws <= 128
            and row_bytes <= 4 * 1024 * 1024)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, ws: int, nw: int, heads: int,
            scale: float):
    # refs: (1, ws, nw*ws, C)
    c = q_ref.shape[-1]
    d = c // heads
    for j in range(nw):  # static loop over the windows in this row
        sl = slice(j * ws, (j + 1) * ws)
        q = q_ref[0, :, sl, :].reshape(ws * ws, c)
        k = k_ref[0, :, sl, :].reshape(ws * ws, c)
        v = v_ref[0, :, sl, :].reshape(ws * ws, c)
        outs = []
        for h in range(heads):
            hs = slice(h * d, (h + 1) * d)
            s = jax.lax.dot_general(
                q[:, hs], k[:, hs], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (T, T)
            s = s - jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s)
            p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(v.dtype)
            outs.append(jax.lax.dot_general(
                p, v[:, hs], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))  # (T, D)
        o = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)
        o_ref[0, :, sl, :] = o.reshape(ws, ws, c)


def _forward(q, k, v, ws: int, heads: int, scale: float,
             interpret: bool = False):
    b, hp, wp, c = q.shape
    nh_, nw_ = hp // ws, wp // ws
    kern = functools.partial(_kernel, ws=ws, nw=nw_, heads=heads, scale=scale)
    spec = pl.BlockSpec((1, ws, wp, c), lambda i, j: (i, j, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(b, nh_),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _xla_attention(q, k, v, ws: int, heads: int, scale: float):
    """Reference lowering: window partition + batched einsums + merge."""
    b, hp, wp, c = q.shape
    d = c // heads
    nh_, nw_ = hp // ws, wp // ws

    def windows(t):
        t = t.reshape(b, nh_, ws, nw_, ws, c).transpose(0, 1, 3, 2, 4, 5)
        return t.reshape(b, nh_ * nw_, ws * ws, heads, d)

    qw, kw, vw = windows(q), windows(k), windows(v)
    attn = jnp.einsum("bwihd,bwjhd->bwhij", qw, kw, precision=HIGH) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bwhij,bwjhd->bwihd", attn, vw, precision=HIGH)
    out = out.reshape(b, nh_, nw_, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(b, hp, wp, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention(q, k, v, ws: int, heads: int, scale: float):
    return _forward(q, k, v, ws, heads, scale)


def _attention_fwd(q, k, v, ws: int, heads: int, scale: float):
    return _forward(q, k, v, ws, heads, scale), (q, k, v)


def _attention_bwd(ws: int, heads: int, scale: float, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_attention(q_, k_, v_, ws, heads, scale),
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    dq, dk, dv = vjp(g.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_attention.defvjp(_attention_fwd, _attention_bwd)


def window_attention(q, k, v, ws: int, heads: int, scale: float):
    """ws x ws window attention on natural-layout (B, Hp, Wp, C) q/k/v.

    Hp/Wp must already be padded to multiples of ws (the caller pads the
    token grid before its q/k/v denses).

    Default: the XLA partition/merge lowering. The fused Pallas kernel
    (FF_PALLAS_LSA=1) was bench-MEASURED A LOSS at the FlowFormer
    protocol (18.97 vs 21.03 fps, BENCH.md round 4): per-window
    per-head attention means 2,432 tiny (49, 16) MXU dots per layer
    (8 batch x 19 windows x 8 heads x 2), and Mosaic issues them
    serially — small-dot latency swamps the relayout savings. The
    window-size/head-dim shapes are fundamentally MXU-hostile; kept as
    a documented negative with the measurement.
    """
    import os

    b, hp, wp, c = q.shape
    assert hp % ws == 0 and wp % ws == 0, (hp, wp, ws)
    if (os.environ.get("FF_PALLAS_LSA", "0") == "1"
            and window_attention_supported(ws, c, heads, wp)):
        return _attention(q, k, v, ws, heads, scale)
    return _xla_attention(q, k, v, ws, heads, scale)
