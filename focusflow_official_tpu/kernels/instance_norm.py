"""Pallas TPU kernels: fused instance normalization (+ optional ReLU).

Matches `nn.Norm(kind='instance')` semantics: per-(sample, channel) stats
over H*W, biased variance, eps 1e-5, no affine (torch nn.InstanceNorm2d
defaults). Reference behavior: `FF_RAFT_Core/extractor.py:24-26`.

Motivation (measured on v5e, round 2): the CCE feature encoder applies 30
instance norms per forward; the XLA lowering costs ~11.5 ms of the 18 ms
encoder (vs ~1.6 ms of pure HBM traffic at 2 reads + 1 write per norm).
Round 1's manual double-buffered-DMA kernel was no faster in-graph; this
version leans on the Pallas grid pipeline instead:

- kernel 1 streams (chunk, C) tiles and accumulates f32 sum/sum-of-squares
  into a VMEM-resident (2, C) output block (revisited across the chunk
  grid, written back once per batch element);
- mean/rsqrt fold into a few scalar XLA ops on the (B, 2, C) stats;
- kernel 2 streams the tensor again and normalizes, with the following
  ReLU fused in (saves the separate elementwise pass XLA would emit after
  a custom call).

Differentiable via custom_vjp with an XLA backward (train-time only; the
backward is fusion-friendly there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_instance_norm_supported() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _xla_instance_norm(x: jnp.ndarray, eps: float, relu: bool) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = (xf * xf).mean(axis=(1, 2), keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    out = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    return jnp.maximum(out, 0) if relu else out


def _stats_kernel(x_ref, o_ref, *, chunk: int, hw: int, n_chunks: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    blk = x_ref[0].astype(jnp.float32)  # (chunk, C)
    if hw % chunk:  # mask the padded tail rows of the last chunk
        row = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0) + j * chunk
        blk = jnp.where(row < hw, blk, 0.0)
    o_ref[0, 0, :] += jnp.sum(blk, axis=0)
    o_ref[0, 1, :] += jnp.sum(blk * blk, axis=0)


def _norm_kernel(x_ref, mi_ref, o_ref, *, relu: bool):
    x = x_ref[0]
    mean = mi_ref[0, 0:1, :].astype(x.dtype)
    inv = mi_ref[0, 1:2, :].astype(x.dtype)
    y = (x - mean) * inv
    o_ref[0] = jnp.maximum(y, 0) if relu else y


def _forward(x: jnp.ndarray, eps: float, relu: bool,
             interpret: bool = False) -> jnp.ndarray:
    b, h, w, c = x.shape
    hw = h * w
    xr = x.reshape(b, hw, c)

    # ~1 MB input blocks keep the pipeline busy without starving VMEM
    target_rows = max(512, (1 << 20) // max(1, c * x.dtype.itemsize))
    chunk = min(hw, target_rows)
    chunk = max(8, (chunk // 8) * 8)
    n_chunks = -(-hw // chunk)

    stats = pl.pallas_call(
        functools.partial(_stats_kernel, chunk=chunk, hw=hw, n_chunks=n_chunks),
        grid=(b, n_chunks),
        in_specs=[pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        interpret=interpret,
    )(xr)

    mean = stats[:, 0, :] / hw
    var = stats[:, 1, :] / hw - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mi = jnp.stack([mean, inv], axis=1)  # (B, 2, C) f32

    out = pl.pallas_call(
        functools.partial(_norm_kernel, relu=relu),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
    )(xr, mi)
    return out.reshape(b, h, w, c)


def _stats_only(x: jnp.ndarray, interpret: bool = False):
    """(mean, inv) per (B, C) via the Pallas stats kernel, f32."""
    b, h, w, c = x.shape
    hw = h * w
    xr = x.reshape(b, hw, c)
    target_rows = max(512, (1 << 20) // max(1, c * x.dtype.itemsize))
    chunk = min(hw, max(8, (target_rows // 8) * 8))
    n_chunks = -(-hw // chunk)
    stats = pl.pallas_call(
        functools.partial(_stats_kernel, chunk=chunk, hw=hw, n_chunks=n_chunks),
        grid=(b, n_chunks),
        in_specs=[pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        interpret=interpret,
    )(xr)
    return stats[:, 0, :] / hw, stats[:, 1, :] / hw


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm_stats(x: jnp.ndarray, eps: float = 1e-5):
    """Per-(sample, channel) (mean, rsqrt(var+eps)) as (B, 1, 1, C) f32.

    Pallas computes only the two reductions; the (cheap, elementwise)
    normalize stays in XLA so the activation tensor never crosses a
    custom-call boundary — the conv chain keeps XLA-chosen layouts, which
    is where the full Pallas IN lost its win (BENCH.md Finding 2).
    """
    if not pallas_instance_norm_supported():
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(1, 2))
        ex2 = (xf * xf).mean(axis=(1, 2))
    else:
        mean, ex2 = _stats_only(x)
    inv = jax.lax.rsqrt(ex2 - mean * mean + eps)
    return mean[:, None, None, :], inv[:, None, None, :]


def _stats_fwd(x, eps):
    mean, inv = instance_norm_stats(x, eps)
    return (mean, inv), (x, mean, inv)


def _stats_bwd(eps, res, cts):
    x, mean, inv = res
    gmean, ginv = cts
    n = x.shape[1] * x.shape[2]
    xf = x.astype(jnp.float32)
    # d inv / d var = -0.5 inv^3 ; d var / dx = 2 (x - mean) / N
    dx = (gmean / n) + ginv * (-(inv ** 3)) * (xf - mean) / n
    return (dx.astype(x.dtype),)


instance_norm_stats.defvjp(_stats_fwd, _stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm_pallas(x: jnp.ndarray, eps: float = 1e-5,
                         relu: bool = False) -> jnp.ndarray:
    """Fused instance norm (+ optional trailing ReLU) over NHWC input."""
    if not pallas_instance_norm_supported():
        return _xla_instance_norm(x, eps, relu)
    return _forward(x, eps, relu)


def _fwd(x, eps, relu):
    return instance_norm_pallas(x, eps, relu), x


def _bwd(eps, relu, x, g):
    # XLA backward (train-only): recompute stats; cheap next to the fwd win.
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = (xf * xf).mean(axis=(1, 2), keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    if relu:
        gf = gf * (xhat > 0)
    gm = gf.mean(axis=(1, 2), keepdims=True)
    gxm = (gf * xhat).mean(axis=(1, 2), keepdims=True)
    dx = inv * (gf - gm - xhat * gxm)
    return (dx.astype(x.dtype),)


instance_norm_pallas.defvjp(_fwd, _bwd)
