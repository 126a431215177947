"""Pallas TPU kernel: single-pass fused attention for small-kv attention.

The FlowFormer stack is full of attentions whose KEY/VALUE side is tiny —
Twins GSA subsamples keys by sr_ratio (448 kv tokens at bench shapes,
`twins.py:306-392` / timm Twins) while the query side is the full token
grid (7k-29k). The XLA lowering materializes the (B, H, N, M) attention
matrix in HBM three times (scores write, softmax read+write, AV read):
~0.6 GB of traffic per vertical-global layer at bench shapes, measured
~2 ms/layer against a ~0.1 ms roofline (round-3 xprof, BENCH.md).

Because the whole k/v block fits in VMEM, no online-softmax streaming is
needed: one grid step loads a query block plus ALL keys/values, computes
scores, softmax and the value contraction without the attention matrix
ever touching HBM. HBM traffic drops to one read of q/k/v and one write
of the output.

Interface deliberately takes the PRE-head-split (B, N, C) projections and
returns (B, N, C) — the head axis is sliced lane-wise inside the kernel,
so callers skip the (B, N, H, D) reshapes/transposes entirely.

Differentiable via custom_vjp: the backward recomputes the attention with
plain XLA einsums (standard softmax-attention VJP), mirroring the
instance-norm kernel's train-time strategy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

HIGH = jax.lax.Precision.HIGHEST

# whole-kv VMEM budget: M * C * 4B plus the (blk, M) f32 score tile
_MAX_KV = 4096
_MAX_LANES = 1024


def pallas_attention_supported(n: int, m: int, c: int, heads: int) -> bool:
    """Shape gate: kv side must fit VMEM, C must split evenly into heads."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    return m <= _MAX_KV and c <= _MAX_LANES and c % heads == 0


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    q = q_ref[0]  # (blk, C)
    k = k_ref[0]  # (M, C)
    v = v_ref[0]
    c = q.shape[-1]
    d = c // heads
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (blk, M)
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(v.dtype)
        outs.append(jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))  # (blk, D)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _forward(q, k, v, heads: int, scale: float, interpret: bool = False):
    b, n, c = q.shape
    m = k.shape[1]
    blk = min(512, n)
    pad = (-n) % blk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    np_ = n + pad

    out = pl.pallas_call(
        functools.partial(_attn_kernel, heads=heads, scale=scale),
        grid=(b, np_ // blk),
        in_specs=[
            pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, np_, c), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :n] if pad else out


def _xla_attention(q, k, v, heads: int, scale: float):
    """Reference lowering: in-place head split, no explicit transposes."""
    b, n, c = q.shape
    d = c // heads
    qh = q.reshape(b, n, heads, d)
    kh = k.reshape(b, -1, heads, d)
    vh = v.reshape(b, -1, heads, d)
    attn = jnp.einsum("bihd,bjhd->bhij", qh, kh, precision=HIGH) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhij,bjhd->bihd", attn, vh, precision=HIGH)
    return out.reshape(b, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention(q, k, v, heads: int, scale: float):
    return _forward(q, k, v, heads, scale)


def _attention_fwd(q, k, v, heads: int, scale: float):
    return _forward(q, k, v, heads, scale), (q, k, v)


def _attention_bwd(heads: int, scale: float, res, g):
    q, k, v = res
    b, n, c = q.shape
    d = c // heads
    qh = q.reshape(b, n, heads, d).astype(jnp.float32)
    kh = k.reshape(b, -1, heads, d).astype(jnp.float32)
    vh = v.reshape(b, -1, heads, d).astype(jnp.float32)
    gh = g.reshape(b, n, heads, d).astype(jnp.float32)

    s = jnp.einsum("bihd,bjhd->bhij", qh, kh, precision=HIGH) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhij,bihd->bjhd", p, gh, precision=HIGH)
    dp = jnp.einsum("bihd,bjhd->bhij", gh, vh, precision=HIGH)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhij,bjhd->bihd", ds, kh, precision=HIGH) * scale
    dk = jnp.einsum("bhij,bihd->bjhd", ds, qh, precision=HIGH) * scale
    return (dq.reshape(b, n, c).astype(q.dtype),
            dk.reshape(*k.shape).astype(k.dtype),
            dv.reshape(*v.shape).astype(v.dtype))


_attention.defvjp(_attention_fwd, _attention_bwd)


def small_kv_attention(q, k, v, heads: int, scale: float):
    """Multi-head attention, q (B, N, C) x k/v (B, M, C) -> (B, N, C).

    Uses the fused Pallas kernel when the shape qualifies on TPU, the plain
    XLA einsum lowering otherwise (CPU tests, exotic shapes). Opt out with
    FF_PALLAS_ATTN=0.
    """
    import os

    b, n, c = q.shape
    m = k.shape[1]
    if (os.environ.get("FF_PALLAS_ATTN", "1") != "0"
            and pallas_attention_supported(n, m, c, heads)):
        return _attention(q, k, v, heads, scale)
    return _xla_attention(q, k, v, heads, scale)
