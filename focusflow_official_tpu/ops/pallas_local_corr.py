"""Pallas TPU kernel for PWC-Net's local (windowed) correlation.

Replaces the reference's four CUDA/CuPy kernels
(`/root/reference/core/models/ff-pwcnet/PWCNet_Core/correlation.py:7-232`)
for the forward; the backward differentiates the XLA shift formulation
(`ops/local_corr.py`) via custom_vjp — `jax.grad` of a shift is a shift,
so no hand-written gradient kernels are needed.

Design: the op is elementwise-reduce shaped (no contraction to feed the
MXU), so the kernel is a VPU pass that keeps one batch element's feature
maps VMEM-resident and walks the 81 *static* displacements — the XLA
lowering instead re-streams padded HBM tensors per shift and measured
~2.7x off the compute floor (BENCH.md round 2, 1.59 ms f32 across the
5 PWC decoder levels at train shapes).

Layout: channels-leading (C, H, W) inside the kernel so W rides the lanes
at full width; the NHWC<->NCHW transposes at the boundary are small and
XLA-fused. Output is (81, H, W) per batch element (full-tile writes), the
wrapper transposes back to the reference's NHWC channel order.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .local_corr import local_corr as _xla_local_corr

# per-batch-element VMEM budget for f1 + padded f2 + out (bytes)
_VMEM_CAP = 10 * 1024 * 1024


def pallas_local_corr_supported() -> bool:
    if os.environ.get("FF_DISABLE_PALLAS_LOCAL_CORR"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _kernel(f1_ref, f2_ref, o_ref, *, r: int, h: int, w: int, c: int):
    k = 2 * r + 1
    f1 = f1_ref[0].astype(jnp.float32)  # (C, H, W)
    inv_c = 1.0 / c
    for dy in range(k):
        for dx in range(k):
            sh = f2_ref[0, :, dy : dy + h, dx : dx + w].astype(jnp.float32)
            o_ref[0, dy * k + dx] = jnp.sum(f1 * sh, axis=0) * inv_c


def _fits(h: int, w: int, c: int, r: int, itemsize: int) -> bool:
    k2 = (2 * r + 1) ** 2
    need = (c * h * w + c * (h + 2 * r) * (w + 2 * r)) * itemsize + h * w * k2 * 4
    return need <= _VMEM_CAP


def _forward(fmap1, fmap2, radius: int, interpret: bool = False):
    b, h, w, c = fmap1.shape
    r = radius
    k2 = (2 * r + 1) ** 2
    f1 = fmap1.transpose(0, 3, 1, 2)  # (B, C, H, W)
    f2 = jnp.pad(fmap2.transpose(0, 3, 1, 2),
                 ((0, 0), (0, 0), (r, r), (r, r)))
    out = pl.pallas_call(
        functools.partial(_kernel, r=r, h=h, w=w, c=c),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c, h + 2 * r, w + 2 * r), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k2, h, w), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, k2, h, w), jnp.float32),
        interpret=interpret,
    )(f1, f2)
    return out.transpose(0, 2, 3, 1).astype(fmap1.dtype)  # (B, H, W, 81)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def local_corr_pallas(fmap1, fmap2, radius: int = 4):
    """Windowed correlation (B,H,W,C) x2 -> (B,H,W,(2r+1)^2), dy-major.

    Falls back to the XLA formulation off-TPU or when a batch element's
    working set exceeds the VMEM budget (PWC's 5 decoder levels all fit).
    """
    if not pallas_local_corr_supported() or not _fits(
        *fmap1.shape[1:3], fmap1.shape[3], radius, fmap1.dtype.itemsize
    ):
        return _xla_local_corr(fmap1, fmap2, radius)
    return _forward(fmap1, fmap2, radius)


def _fwd(fmap1, fmap2, radius):
    return local_corr_pallas(fmap1, fmap2, radius), (fmap1, fmap2)


def _bwd(radius, res, g):
    fmap1, fmap2 = res
    _, vjp = jax.vjp(lambda a, b: _xla_local_corr(a, b, radius), fmap1, fmap2)
    return vjp(g)


local_corr_pallas.defvjp(_fwd, _bwd)
