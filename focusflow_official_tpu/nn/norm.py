"""Normalization layers with torch-equivalent semantics (NHWC).

One `Norm` module covers the four kinds the reference encoders select from
(`/root/reference/core/models/ff-raft/FF_RAFT_Core/extractor.py:16-38`):

- 'group'    : GroupNorm, affine, eps 1e-5 (torch nn.GroupNorm defaults)
- 'batch'    : BatchNorm, affine, running stats (momentum 0.1), eps 1e-5
- 'instance' : InstanceNorm, NO affine, NO running stats (torch
               nn.InstanceNorm2d defaults), eps 1e-5
- 'none'     : identity

Parameters live flat on this module ('scale'/'bias', batch stats 'mean'/'var')
so torch checkpoint paths map 1:1 (e.g. `norm1.weight` -> `norm1/scale`).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

# Opt-in: route instance norms through the fused Pallas kernel
# (FF_PALLAS_INSTANCE_NORM=1). Measured round 2 (BENCH.md): the kernel
# itself is at HBM roofline (norm cost 11.5 -> 2.6 ms across the CCE
# encoder), but mosaic custom calls pin row-major layouts at their
# boundaries, which halves the surrounding convolutions' throughput
# (13.1 ms vs 6.5 with XLA-free layouts) — a net loss at the model level
# (21.6 vs 22.1 fps). Default stays on the XLA formulation until the
# layout boundary is solved; the kernel + tests remain for that round.
_USE_PALLAS_INSTANCE_NORM = os.environ.get("FF_PALLAS_INSTANCE_NORM", "0") == "1"
# Stats-only variant (DEFAULT on TPU): Pallas computes just the (B, C)
# reductions; XLA keeps the layout-sensitive normalize, so the activation
# tensor never crosses a custom-call boundary and the conv chain keeps
# XLA-chosen layouts. Measured 23.8 -> 25.1 fps on the flagship bench
# (BENCH.md round 2). FF_PALLAS_IN_STATS=0 opts out.
_USE_PALLAS_IN_STATS = os.environ.get("FF_PALLAS_IN_STATS", "1") == "1"
# A/B: optimization_barrier between the conv chain and the stats custom call
# (see the instance branch below).
_IN_STATS_BARRIER = os.environ.get("FF_IN_STATS_BARRIER", "0") == "1"


def _pallas_in_ok() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def zero_virtual_rows(x: jnp.ndarray, nc: int, margin: int) -> jnp.ndarray:
    """Zero the rows of a row-chunked (B*nc, rows, W, C) tensor that lie
    OUTSIDE the true image: the first `margin` rows of each image's slab 0
    and the last `margin` rows of its slab nc-1. The full-image conv chain
    zero-pads at the image border before every spatial conv; chunked slabs
    must show those convs the same zeros or the border rows diverge
    (interior slab margins keep real neighbor data and are untouched).
    Pure elementwise select — XLA fuses it into the surrounding chain."""
    bn, rows = x.shape[0], x.shape[1]
    slab = jax.lax.broadcasted_iota(jnp.int32, (bn, rows), 0) % nc
    row = jax.lax.broadcasted_iota(jnp.int32, (bn, rows), 1)
    virtual = ((slab == 0) & (row < margin)) | (
        (slab == nc - 1) & (row >= rows - margin))
    return jnp.where(virtual[:, :, None, None], jnp.zeros((), x.dtype), x)


def instance_norm_rowchunks(x: jnp.ndarray, nc: int, margin: int,
                            epsilon: float, fuse_relu: bool,
                            dtype) -> jnp.ndarray:
    """Instance norm over a row-chunked (B*nc, rows, W, C) tensor.

    Stats are computed EXACTLY from the disjoint core rows and combined
    across each image's nc chunks (bit-identical reduction tree regardless
    of C — the packed CCE path runs both branches on one 2C tensor through
    this same function). The normalize applies to the whole chunk (margins
    get the same global stats the true rows would) and image-border virtual
    rows are re-zeroed for the next spatial conv. Pure jnp: differentiable,
    and no custom call enters the chunked region."""
    bn, rows, w, _ = x.shape
    b = bn // nc
    core = x[:, margin : rows - margin]
    s1 = jnp.sum(core, axis=(1, 2), dtype=jnp.float32)  # (B*nc, C)
    s2 = jnp.sum(core * core, axis=(1, 2), dtype=jnp.float32)
    s1 = s1.reshape(b, nc, -1).sum(axis=1)
    s2 = s2.reshape(b, nc, -1).sum(axis=1)
    count = nc * core.shape[1] * w
    mean = s1 / count
    var = jnp.maximum(s2 / count - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + epsilon)
    mean_b = jnp.repeat(mean.astype(dtype), nc, axis=0)[:, None, None, :]
    inv_b = jnp.repeat(inv.astype(dtype), nc, axis=0)[:, None, None, :]
    out = ((x - mean_b) * inv_b).astype(dtype)
    out = nn.relu(out) if fuse_relu else out
    return zero_virtual_rows(out, nc, margin)


def instance_norm_eval(x: jnp.ndarray, epsilon: float, fuse_relu: bool,
                       dtype) -> jnp.ndarray:
    """Eval-time instance norm (no affine) with the production TPU lowering:
    Pallas stats custom call when enabled (FF_PALLAS_IN_STATS), pure-XLA
    reductions otherwise. Shared by `Norm` (unchunked instance/eval branch)
    and the packed CCE path so both produce the identical graph."""
    if _USE_PALLAS_IN_STATS and _pallas_in_ok():
        from ..kernels.instance_norm import instance_norm_stats

        xs = x
        if _IN_STATS_BARRIER:
            (xs,) = jax.lax.optimization_barrier((x,))
        mean, inv = instance_norm_stats(xs, epsilon)
        out = (x - mean.astype(dtype)) * inv.astype(dtype)
        out = out.astype(dtype)
        return nn.relu(out) if fuse_relu else out
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(x * x, axis=(1, 2), keepdims=True,
                   dtype=jnp.float32) - mean * mean
    var = jnp.maximum(var, 0.0)
    inv = jax.lax.rsqrt(var + epsilon)
    out = ((x - mean.astype(dtype)) * inv.astype(dtype)).astype(dtype)
    return nn.relu(out) if fuse_relu else out


class Norm(nn.Module):
    kind: str  # 'group' | 'batch' | 'instance' | 'none'
    features: int
    num_groups: int = 8
    epsilon: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True,
                 fuse_relu: bool = False, is_eval: bool | None = None,
                 row_chunks: tuple[int, int] | None = None) -> jnp.ndarray:
        """fuse_relu: apply the block's trailing ReLU inside the norm — the
        Pallas instance-norm kernel folds it into its normalize pass; for
        the other kinds XLA fuses the elementwise chain anyway.

        is_eval: the actual train/eval distinction, which gates the Pallas
        instance-norm lowering (the stats kernel is a measured win at eval
        and a measured loss in the train graph — BENCH.md round 2). This is
        deliberately separate from use_running_average: encoders pass
        ura=(not train) or freeze_bn, and freeze_bn is true for every
        post-chairs TRAINING stage, so ura alone cannot distinguish
        training from eval. Defaults to use_running_average for callers
        where the two coincide (no freeze_bn in play).

        row_chunks: (nc, margin) when x arrives row-chunked as
        (B*nc, rows, W, C) with `margin` overlap rows on each side
        (`cce.py` manual space-to-batch). Instance stats are then computed
        EXACTLY from the disjoint core rows and combined across each
        image's nc chunks; the normalize applies to the whole chunk
        (margins get the same global stats the true rows would)."""
        kind = self.kind
        if is_eval is None:
            is_eval = use_running_average
        if row_chunks is not None and kind == "instance":
            nc, margin = row_chunks
            return instance_norm_rowchunks(
                x, nc, margin, self.epsilon, fuse_relu, self.dtype)
        if kind == "none":
            return nn.relu(x) if fuse_relu else x
        c = self.features
        d = self.dtype
        # stats in f32 (XLA fuses the cast into the reductions); the
        # normalization itself runs in the compute dtype so bf16 tensors never
        # materialize in f32
        xf = x.astype(jnp.float32)

        if kind == "group":
            b, h, w, _ = x.shape
            g = self.num_groups
            xg = x.reshape(b, h, w, g, c // g)
            mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True, dtype=jnp.float32)
            var = jnp.mean(xg * xg, axis=(1, 2, 4), keepdims=True,
                           dtype=jnp.float32) - mean * mean
            # E[x^2]-mean^2 with the square taken in the model dtype can go
            # (slightly) negative for offset-dominated channels; clamp so
            # rsqrt never sees var+eps < 0 (free: fuses into the reduction).
            var = jnp.maximum(var, 0.0)
            inv = jax.lax.rsqrt(var + self.epsilon)
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            xn = (x.reshape(b, h, w, g, c // g) - mean.astype(d)) * inv.astype(d)
            out = xn.reshape(b, h, w, c) * scale.astype(d) + bias.astype(d)

        elif kind == "instance":
            if _USE_PALLAS_INSTANCE_NORM and _pallas_in_ok():
                from ..kernels.instance_norm import instance_norm_pallas

                return instance_norm_pallas(x, self.epsilon, fuse_relu).astype(d)
            # eval lowering (Pallas stats when enabled — a measured win at
            # eval and a measured loss in the train graph, 474 vs 466
            # ms/step — else the same pure-XLA reductions as training).
            # Shared with the packed CCE path via `instance_norm_eval`.
            if is_eval:
                return instance_norm_eval(x, self.epsilon, fuse_relu, d)
            # f32 ACCUMULATION via the reduction dtype (not an explicit
            # upcast): profiled round 2, `x.astype(f32)` made XLA materialize
            # full f32 copies of the activation inside the conv fusions
            mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
            var = jnp.mean(x * x, axis=(1, 2), keepdims=True,
                           dtype=jnp.float32) - mean * mean
            var = jnp.maximum(var, 0.0)  # see group-norm comment
            inv = jax.lax.rsqrt(var + self.epsilon)
            out = (x - mean.astype(d)) * inv.astype(d)

        elif kind == "batch":
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
            if use_running_average:
                mean, var = ra_mean.value, ra_var.value
            else:
                mean = xf.mean(axis=(0, 1, 2))
                var = xf.var(axis=(0, 1, 2))
                if not self.is_initializing():
                    n = xf.shape[0] * xf.shape[1] * xf.shape[2]
                    # torch updates running_var with the unbiased estimate.
                    unbiased = var * (n / max(n - 1, 1))
                    m = self.momentum
                    ra_mean.value = (1 - m) * ra_mean.value + m * mean
                    ra_var.value = (1 - m) * ra_var.value + m * unbiased
            inv = jax.lax.rsqrt(var + self.epsilon)
            out = (x - mean.astype(d)) * inv.astype(d) * scale.astype(d) + bias.astype(d)

        else:
            raise ValueError(f"Unknown norm kind: {kind}")

        out = out.astype(self.dtype)
        return nn.relu(out) if fuse_relu else out
