"""All-pairs 4D correlation volume, pyramid, and windowed bilinear lookup.

TPU-native redesign of RAFT's CorrBlock
(`/root/reference/core/models/ff-raft/FF_RAFT_Core/corr.py:12-60`):

- the all-pairs volume is one big (B, HW, HW) matmul — MXU food — scaled by
  1/sqrt(C) and kept in HBM;
- the 4-level pyramid is built with floor-semantics 2x2 average pooling over
  the *second* image's spatial axes;
- the per-iteration (2r+1)^2-window lookup is a gather-based bilinear sample
  (`lookup_corr_pyramid`), matching the reference's channel ordering exactly:
  within a level, the offset added to x varies slowest (the reference adds the
  meshgrid's (dy, dx) to (x, y), so its window is transposed relative to naive
  expectations — see `corr.py:39-43`); levels are concatenated coarse-last.

The functional interface keeps everything jit-friendly: `CorrPyramid` is a
NamedTuple pytree carried through `lax.scan`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pool import avg_pool2x2
from .pallas_lookup import lookup_corr_pyramid_pallas, pallas_lookup_supported


class CorrPyramid(NamedTuple):
    """Correlation pyramid: per level an array (B, H1*W1, H2_l, W2_l)."""

    levels: Tuple[jnp.ndarray, ...]
    radius: int


def all_pairs_corr(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs correlation of NHWC feature maps -> (B, H*W, H, W).

    corr[b, q, y, x] = <fmap1[b, q], fmap2[b, y, x]> / sqrt(C)
    (reference: `corr.py:52-60`). The contraction runs on the MXU in fp32
    accumulation regardless of input dtype.
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    # HIGHEST keeps f32 inputs at full precision (bf16 inputs already
    # accumulate in f32 on the MXU, so this costs nothing on the bf16 path).
    corr = jnp.einsum(
        "bqc,bpc->bqp",
        f1,
        f2,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    corr = corr / jnp.sqrt(jnp.array(c, jnp.float32))
    return corr.reshape(b, h * w, h, w)


def corr_pyramid(corr: jnp.ndarray, num_levels: int = 4, radius: int = 4,
                 fused: bool = False) -> CorrPyramid:
    """Build the average-pooled pyramid over the last two (target) axes.

    With `fused=True` no pooling happens: the fused lookup computes every
    level straight from the level-0 volume (`lookup_corr_fused`), so the
    pyramid carries only that."""
    if fused:
        return CorrPyramid(levels=(corr,), radius=radius)
    levels = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool2x2(corr)
        levels.append(corr)
    return CorrPyramid(levels=tuple(levels), radius=radius)


def _lookup_level(corr_l: jnp.ndarray, coords: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Bilinear window lookup on one pyramid level.

    corr_l: (B, Q, H2, W2); coords: (B, H1, W1, 2) already scaled to this
    level's resolution. Returns (B, H1, W1, (2r+1)^2) with the reference's
    channel order (x-offset-major).
    """
    b, q, h2, w2 = corr_l.shape
    _, h1, w1, _ = coords.shape
    k = 2 * radius + 1

    d = jnp.linspace(-radius, radius, k, dtype=jnp.float32)
    # Reference quirk (`corr.py:39-43`): delta[..., 0] (added to x) comes from
    # the *first* meshgrid axis, so x-offset varies slowest in the flat window.
    dx = jnp.repeat(d, k)  # (K2,) x-offset, slow axis
    dy = jnp.tile(d, k)  # (K2,) y-offset, fast axis
    k2 = k * k

    cx = coords[..., 0].reshape(b, q)[..., None] + dx[None, None, :]  # (B, Q, K2)
    cy = coords[..., 1].reshape(b, q)[..., None] + dy[None, None, :]

    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    wx1 = cx - x0
    wy1 = cy - y0

    corr_flat = corr_l.reshape(b, q, h2 * w2)

    def tap(xi, yi, wgt):
        valid = (xi >= 0) & (xi <= w2 - 1) & (yi >= 0) & (yi <= h2 - 1)
        xi_c = jnp.clip(xi, 0, w2 - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h2 - 1).astype(jnp.int32)
        idx = yi_c * w2 + xi_c  # (B, Q, K2)
        vals = jnp.take_along_axis(corr_flat, idx, axis=2)
        return vals * jnp.where(valid, wgt, 0.0).astype(vals.dtype)

    out = (
        tap(x0, y0, (1 - wx1) * (1 - wy1))
        + tap(x0 + 1, y0, wx1 * (1 - wy1))
        + tap(x0, y0 + 1, (1 - wx1) * wy1)
        + tap(x0 + 1, y0 + 1, wx1 * wy1)
    )
    return out.reshape(b, h1, w1, k2)


def _tent_weights(pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """Dense linear-interpolation ("tent") weights: (..., K, size).

    w[..., k, t] = max(0, 1 - |pos[..., k] - t|). Rows fully outside
    [0, size-1] get all-zero weights — exactly grid_sample's zero padding.
    """
    t = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - t))


def _lookup_level_mxu_impl(corr_l: jnp.ndarray, coords: jnp.ndarray, radius: int,
                           dtype=jnp.bfloat16) -> jnp.ndarray:
    """Gather-free window lookup: two batched tent-weight matmuls (MXU).

    out[q, i, j] = sum_{Y,X} tent(cx+d_i - X) * tent(cy+d_j - Y) * corr[q, Y, X]
    — exact bilinear sampling of the (2r+1)^2 window with zero padding,
    reformulated as dense contractions because XLA gathers serialize on TPU
    while small batched matmuls ride the MXU. Channel order (i = x-offset
    slow, j = y-offset fast) matches the reference quirk (`corr.py:39-43`).
    """
    b, q, h2, w2 = corr_l.shape
    _, h1, w1, _ = coords.shape
    k = 2 * radius + 1

    d = jnp.linspace(-radius, radius, k, dtype=jnp.float32)
    cx = coords[..., 0].reshape(b, q)  # (B, Q)
    cy = coords[..., 1].reshape(b, q)

    sx = _tent_weights(cx[..., None] + d, w2).astype(dtype)  # (B, Q, K, W2)
    sy = _tent_weights(cy[..., None] + d, h2).astype(dtype)  # (B, Q, K, H2)
    c = corr_l.astype(dtype)

    # Contraction order measured end-to-end (round 2): x-first = 22.13 fps,
    # y-first (W2-minor intermediate) = 21.77 fps — XLA's layout choices
    # here don't track minor-dim reasoning; keep the measured winner.
    # T[b,q,y,i] = sum_x corr[b,q,y,x] * sx[b,q,i,x]
    t = jnp.einsum("bqyx,bqix->bqyi", c, sx)
    # out[b,q,j,i] = sum_y sy[b,q,j,y] * T[b,q,y,i] — SAME (j slow, i fast)
    # chunk order as `lookup_corr_fused_chunks`, consumable by
    # `nn.update.ChunkFoldedConv1x1` without any activation repack
    return jnp.einsum("bqjy,bqyi->bqji", sy, t)


# In the training scan the (B, Q, K, H2/W2) tent operands would otherwise be
# saved per iteration and re-read in the backward through layout-conversion
# copies (~14 ms/step at chairs shapes, round-3 xprof); `dots_saveable` keeps
# the MXU results and recomputes only the cheap elementwise tent builds.
def _lookup_level_mxu_chunk(corr_l: jnp.ndarray, coords: jnp.ndarray,
                            radius: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """One level's window lookup as a query-space (B, Q, Kj, Ki) chunk."""
    fn = jax.checkpoint(
        lambda c_l, co: _lookup_level_mxu_impl(c_l, co, radius, dtype),
        policy=jax.checkpoint_policies.dots_saveable,
    )
    return fn(corr_l, coords)


def _lookup_level_mxu(corr_l: jnp.ndarray, coords: jnp.ndarray, radius: int,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    """NHWC (B, H1, W1, K*K) form, reference channel order i*K + j."""
    b = corr_l.shape[0]
    _, h1, w1, _ = coords.shape
    k = 2 * radius + 1
    out = _lookup_level_mxu_chunk(corr_l, coords, radius, dtype)
    out = out.transpose(0, 1, 3, 2)  # (B, Q, Ki, Kj)
    return out.reshape(b, h1, w1, k * k).astype(jnp.float32)


def lookup_corr_mxu_chunks(pyramid: CorrPyramid, coords: jnp.ndarray,
                           dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, ...]:
    """Per-level MXU window lookups as query-space (B, Q, K, K) chunks —
    the same chunk tuple `lookup_corr_fused_chunks` emits, consumed by
    `nn.update.ChunkFoldedConv1x1` with zero activation repack (the
    (B,Q,K,K)->(B,H,W,81) reshapes cost ~5 ms/train-step, round-3 xprof)."""
    return tuple(
        _lookup_level_mxu_chunk(corr_l, coords / (2.0**i), pyramid.radius, dtype)
        for i, corr_l in enumerate(pyramid.levels)
    )


def _pool_sizes(h: int, w: int, num_levels: int):
    """Per-level (H_l, W_l) under floor-semantics 2x2 average pooling."""
    sizes = [(h, w)]
    for _ in range(num_levels - 1):
        h, w = h // 2, w // 2
        sizes.append((h, w))
    return sizes


def _block_tent_weights_t(pos: jnp.ndarray, level: int, size0: int,
                          size_l: int) -> jnp.ndarray:
    """Transposed `_block_tent_weights`: (..., size0, K), built natively in
    that order (no transpose op) for the y-contraction operand layout."""
    y = jnp.arange(size0, dtype=jnp.int32)
    yb = (y >> level).astype(jnp.float32)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None, :] - yb[..., :, None]))
    if size_l << level < size0:
        tent = tent * (y < (size_l << level))[..., :, None]
    return tent * (2.0 ** -level)


def _block_tent_weights(pos: jnp.ndarray, level: int, size0: int,
                        size_l: int) -> jnp.ndarray:
    """Tent weights at pyramid level `level`, composed with the exact
    floor-semantics avg-pool chain, expressed over *level-0* indices.

    pos: (..., K) level-l window positions. Returns (..., K, size0) with
    w[..., k, y] = 2^-level * tent(pos_k - (y >> level)) * [y < size_l*2^level]
    — the level-l bilinear tap weight spread uniformly over the 2^level
    level-0 rows that average-pooled into it (odd trailing rows that floor
    pooling drops get zero weight, matching `avg_pool2x2` bit-for-bit).
    """
    y = jnp.arange(size0, dtype=jnp.int32)
    yb = (y >> level).astype(jnp.float32)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - yb))
    if size_l << level < size0:  # pooled-away trailing rows
        tent = tent * (y < (size_l << level))
    return tent * (2.0 ** -level)


def _block_tent_weights_t_base(scaled: jnp.ndarray, d: jnp.ndarray, level: int,
                               size0: int, size_l: int) -> jnp.ndarray:
    """`_block_tent_weights_t` with the (query - grid) "base" hoisted.

    Mathematically the same tent (one f32 reassociation: (c/2^l - y) + d
    instead of (c/2^l + d) - y). The point is the TPU layout: the naive
    form expands a q-in-lanes (B, Q, K) tap tensor against the grid axis,
    and every output tile write crosses lanes (round-4 xprof: the sx/sy
    builds ran at ~62 GB/s effective, ~2 ms/forward). Hoisting
    base[q, y] = c[q]/2^l - (y >> level) pays the lane->sublane crossing
    ONCE per level on a (B, Q, size0) tensor; the (B, Q, size0, K)
    expansion then only adds the per-tap scalar d[k] along the sublane
    axis — lane-aligned all the way.
    """
    y = jnp.arange(size0, dtype=jnp.int32)
    yb = (y >> level).astype(jnp.float32)
    base = scaled[..., None] - yb  # (B, Q, size0)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(base[..., :, None] + d))
    if size_l << level < size0:
        tent = tent * (y < (size_l << level))[..., :, None]
    return tent * (2.0 ** -level)


def _block_tent_weights_base(scaled: jnp.ndarray, d: jnp.ndarray, level: int,
                             size0: int, size_l: int) -> jnp.ndarray:
    """`_block_tent_weights` with the hoisted lane-aligned base (see
    `_block_tent_weights_t_base`). Returns (..., K, size0)."""
    y = jnp.arange(size0, dtype=jnp.int32)
    yb = (y >> level).astype(jnp.float32)
    base = scaled[..., None] - yb  # (B, Q, size0)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(base[..., None, :] + d[:, None]))
    if size_l << level < size0:
        tent = tent * (y < (size_l << level))
    return tent * (2.0 ** -level)


def _block_tent_weights_rows(cx: jnp.ndarray, d: jnp.ndarray, sizes,
                             size0: int, dtype) -> jnp.ndarray:
    """All levels' hoisted-base x-tents as ONE broadcast expression.

    Same math per row as the per-level `_block_tent_weights_base` +
    concat (row (l, k): max(0, 1 - |cx/2^l - (x >> l) + d_k|) * mask_l *
    2^-l), but emitted as a single (B, Q, L*K, size0) elementwise chain:
    the concat-of-4-builds form made XLA materialize a 4-tuple of
    (B, Q, K, size0) intermediates (9 -> 16 sublane tile padding) and
    re-read them in a second concat fusion — ~115 MB of extra round-trip
    traffic and 1.45 ms/forward at bench shapes (round-5 xprof:
    `maximum_convert_fusion` 0.40 + `pad_maximum_fusion` 1.05).
    All level/tap constants ride a 36-row table broadcast along lanes.
    """
    levels = len(sizes)
    k = d.shape[0]
    lrow = np.repeat(np.arange(levels), k)  # (LK,)
    scale_row = jnp.asarray((2.0 ** -lrow)[:, None].astype(np.float32))
    drow = jnp.tile(d, levels)[:, None]  # (LK, 1)
    x = np.arange(size0, dtype=np.int64)
    xb = jnp.asarray((x[None, :] >> lrow[:, None]).astype(np.float32))
    maskw = np.ones((levels * k, size0), np.float32)
    for l, (_, wl) in enumerate(sizes):
        if wl << l < size0:
            maskw[l * k:(l + 1) * k, x >= (wl << l)] = 0.0
    gain = jnp.asarray(maskw) * scale_row  # (LK, size0)

    base = cx[..., None, None] * scale_row - xb  # (B, Q, LK, size0)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(base + drow))
    return (tent * gain).astype(dtype)


def _block_tent_weights_t_rows(cy: jnp.ndarray, d: jnp.ndarray, sizes,
                               size0: int, dtype) -> jnp.ndarray:
    """Transposed-layout row-table build: all levels' y-tents as one
    (B, Q, size0, L*K) expression (cf. `_block_tent_weights_rows`)."""
    levels = len(sizes)
    k = d.shape[0]
    lrow = np.repeat(np.arange(levels), k)  # (LK,)
    scale_row = jnp.asarray((2.0 ** -lrow).astype(np.float32))  # (LK,)
    drow = jnp.tile(d, levels)  # (LK,)
    y = np.arange(size0, dtype=np.int64)
    yb = jnp.asarray((y[:, None] >> lrow[None, :]).astype(np.float32))
    maskh = np.ones((size0, levels * k), np.float32)
    for l, (hl, _) in enumerate(sizes):
        if hl << l < size0:
            maskh[y >= (hl << l), l * k:(l + 1) * k] = 0.0
    gain = jnp.asarray(maskh) * scale_row  # (size0, LK)

    base = cy[..., None, None] * scale_row - yb  # (B, Q, size0, LK)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(base + drow))
    return (tent * gain).astype(dtype)


def lookup_corr_fused(
    corr0: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int,
    num_levels: int = 4,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """All pyramid levels' window lookups fused into ONE matmul pair per
    query, directly on the level-0 volume — no pooled pyramid is ever built.

    Pooling commutes with the (linear) bilinear window sample, so the level-l
    lookup equals a level-0 lookup with pool-composed "block tent" weights
    (`_block_tent_weights`). Stacking all levels' weights makes the two
    contractions (B*Q)x(LK, H2)@(H2, W2) and (LK, W2)-reductions — ~1.9x
    fewer MXU feed cycles than per-level tent matmuls, and the (2.9 ms at
    bench shapes) pyramid pooling + its HBM traffic disappear.

    Matches the reference CorrBlock output (`corr.py:29-50`) exactly up to
    float association; channel order x-offset-major per level, fine-to-coarse.
    """
    b, q, h2, w2 = corr0.shape
    _, h1, w1, _ = coords.shape
    k = 2 * radius + 1
    sizes = _pool_sizes(h2, w2, num_levels)

    d = jnp.linspace(-radius, radius, k, dtype=jnp.float32)
    cx = coords[..., 0].reshape(b, q)
    cy = coords[..., 1].reshape(b, q)

    # built y-minor-last-but-one: the stage-1 dot contracts y, and feeding
    # (B, Q, H2, LK) avoids the (B, Q, LK, H2) relayout copy XLA otherwise
    # inserts before the dot (~0.15 ms/iter profiled)
    sy_all_t = jnp.concatenate(
        [
            _block_tent_weights_t(cy[..., None] / (2.0 ** l) + d, l, h2, hl)
            for l, (hl, _) in enumerate(sizes)
        ],
        axis=-1,
    ).astype(dtype)  # (B, Q, H2, L*K)
    sx_all = jnp.concatenate(
        [
            _block_tent_weights(cx[..., None] / (2.0 ** l) + d, l, w2, wl)
            for l, (_, wl) in enumerate(sizes)
        ],
        axis=-2,
    ).astype(dtype)  # (B, Q, L*K, W2)

    c = corr0.astype(dtype)
    t = jnp.einsum("bqyj,bqyx->bqjx", sy_all_t, c,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    # Stage 2 computes the FULL (LK, LK) product even though only the L
    # diagonal (level-matching) 9x9 blocks are consumed: a level-batched
    # diagonal-only einsum was measured SLOWER end-to-end (22.0 vs 23.6
    # fps) — it reintroduces N=9 batched matmuls, which is exactly the
    # lane-starvation the fused form exists to avoid.
    o = jnp.einsum("bqjx,bqix->bqji", t.astype(dtype), sx_all,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (B, Q, LK_j, LK_i)

    outs = []
    for l in range(num_levels):
        blk = o[:, :, l * k : (l + 1) * k, l * k : (l + 1) * k]  # (B,Q,j,i)
        outs.append(blk.transpose(0, 1, 3, 2).reshape(b, h1, w1, k * k))
    return jnp.concatenate(outs, axis=-1)


def packed_to_reference_perm(num_levels: int, radius: int):
    """Static channel permutation between the packed chunk order and the
    reference order.

    `lookup_corr_fused_chunks` emits level-l channels as j*K + i (j = y
    offset fast... i.e. i varies fastest); the reference emits i*K + j
    (x-offset slow — `corr.py:39-43`). Swapping i and j twice is the
    identity, so this permutation is an involution: it maps packed->ref AND
    ref->packed. Used to fold the reorder into the motion encoder's 1x1
    conv kernel instead of permuting activations every iteration.
    """
    k = 2 * radius + 1
    perm = []
    for l in range(num_levels):
        for i in range(k):
            for j in range(k):
                perm.append(l * k * k + j * k + i)
    return tuple(perm)


def lookup_corr_fused_chunks(
    corr0: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int,
    num_levels: int = 4,
    dtype=jnp.bfloat16,
    marker_ok: bool = True,
) -> Tuple[jnp.ndarray, ...]:
    """Pyramid-free fused lookup, restructured for zero extraction cost.

    Mathematically identical to `lookup_corr_fused` (pool-composed block
    tents on the level-0 volume) but:

    - stage 1 contracts x FIRST: K = W2 = full 128 MXU lanes at bench
      shapes, and the (B, Q, H2, LK) intermediate is H2/W2 ~ 2.3x smaller
      than the y-first form's (B, Q, LK, W2);
    - stage 2 runs one small dot PER LEVEL, producing exactly the L
      diagonal (K, K) blocks as CONTIGUOUS (B, Q, K, K) outputs — the
      y-first form computed the full (LK, LK) cross-level product and paid
      ~0.5 ms/iteration of slice/transpose/copy extracting the diagonal
      (round-3 profile: 2.2 ms of (36,36) writes + 3.5 ms of
      slice/copy/relayout per 12-iteration forward).

    Returns L chunks of (B, Q, K, K) in QUERY space — o[b, q, j, i] with
    j = y offset, i = x offset (the reference order is i*K+j, `corr.py:39-43`).
    Deliberately NOT reshaped to NHWC: the (B, Q, 9, 9) -> (B, H1, W1, 81)
    relayout measured ~0.5 ms/iteration (round-3 profile). Consumers fold
    their first 1x1 conv onto the chunks directly in query space
    (`nn.update.ChunkFoldedConv1x1`) and bitcast the 256-channel result to
    NHWC for free.
    """
    b, q, h2, w2 = corr0.shape
    k = 2 * radius + 1
    sizes = _pool_sizes(h2, w2, num_levels)

    d = jnp.linspace(-radius, radius, k, dtype=jnp.float32)
    cx = coords[..., 0].reshape(b, q)
    cy = coords[..., 1].reshape(b, q)

    import os

    base_build = os.environ.get("FF_TENT_BASE", "1") != "0"
    if base_build:
        # lane-aligned hoisted-base tent builds (BENCH.md Finding 10):
        # measured 35.24 vs 33.59 fps legacy (+4.9%) at the bench protocol
        if os.environ.get("FF_TENT_ROWS", "1") != "0":
            # single-expression row-table build (BENCH.md Finding 13):
            # no per-level concat, no tile-padded intermediate tuple.
            # Measured 39.60 vs 36.23 fps (+9.3%) at the bench protocol
            # -> DEFAULT; FF_TENT_ROWS=0 restores the concat-of-4 form
            sx_all = _block_tent_weights_rows(cx, d, sizes, w2, dtype)
        else:
            sx_all = jnp.concatenate(
                [
                    _block_tent_weights_base(cx / (2.0 ** l), d, l, w2, wl)
                    for l, (_, wl) in enumerate(sizes)
                ],
                axis=-2,
            ).astype(dtype)  # (B, Q, L*K, W2)
        if os.environ.get("FF_TENT_ROWS_Y", "0") == "1":
            # A/B: sy through the same row-table form. Unlike sx, the
            # concat-of-4 sy build gets FUSED into the per-level stage-2
            # dots by XLA (round-5 xprof), so this is not expected to
            # matter; measured for the record.
            sy_all = _block_tent_weights_t_rows(cy, d, sizes, h2, dtype)
        else:
            sy_all = jnp.concatenate(
                [
                    _block_tent_weights_t_base(cy / (2.0 ** l), d, l, h2, hl)
                    for l, (hl, _) in enumerate(sizes)
                ],
                axis=-1,
            ).astype(dtype)  # (B, Q, H2, L*K)
    else:
        sx_all = jnp.concatenate(
            [
                _block_tent_weights(cx[..., None] / (2.0 ** l) + d, l, w2, wl)
                for l, (_, wl) in enumerate(sizes)
            ],
            axis=-2,
        ).astype(dtype)  # (B, Q, L*K, W2)
        # one fused build for every level's y-weights (4 separate builds paid
        # a 0.67 ms/run convert+relayout EACH before their dots — round-3
        # profile)
        sy_all = jnp.concatenate(
            [
                _block_tent_weights_t(cy[..., None] / (2.0 ** l) + d, l, h2, hl)
                for l, (hl, _) in enumerate(sizes)
            ],
            axis=-1,
        ).astype(dtype)  # (B, Q, H2, L*K)

    c = corr0.astype(dtype)
    # t[b,q,y,i] = sum_x corr[b,q,y,x] * sx[b,q,i,x]
    t = jnp.einsum("bqyx,bqix->bqyi", c, sx_all,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(dtype)

    if marker_ok and os.environ.get("FF_STAGE2_FULLFOLD", "0") == "1":
        # Round-5 Finding 12: ONE full (LK, LK) stage-2 product instead of
        # four per-level diagonal dots. The per-level (B, Q, 9, 9) outputs
        # are tile-padded to (16, 128) minors (4% useful bytes) and their
        # flatten+concat feeding the fold kernel paid 4 x ~0.36 ms of
        # VMEM-bound reshapes (round-5 xprof at the bench protocol); the
        # full product writes one 28%-useful (B, Q, 36, 36) tensor whose
        # (36*36)-lane flatten is a single cheaper reshape. The fold
        # consumer zero-expands its kernel onto the level-diagonal blocks
        # (`kernels.fold.fold_full_conv`) so the cross-level products are
        # multiplied away — math identical to the chunk path (the round-3
        # 'full' rejection predates the fold kernel: it extracted the
        # diagonal blocks in XLA and paid exactly the copies this avoids).
        o_full = jnp.einsum("bqyj,bqyi->bqji", sy_all, t,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        return ("full36", o_full, num_levels, k)

    s2k = os.environ.get("FF_STAGE2_KERNEL", "0") if marker_ok else "0"
    if s2k in ("1", "inkernel"):
        # Mosaic stage-2+fold kernel experiment (BENCH.md Finding 11):
        # hand stage 1's t plus the raw query y-coords to the consumer —
        # `ChunkFoldedConv1x1` runs `kernels.stage2.stage2_fold`, which
        # builds the y block-tents in VMEM, contracts with queries in the
        # lane dim, and fuses the folded convc1. '1' = XLA-side
        # pre-transpose of t to q-minor; 'inkernel' = Mosaic transpose
        # (measured +0.9 ms/call standalone — the recorded negative).
        return ("stage2k", t, cy, tuple(hl for hl, _ in sizes), radius,
                s2k != "inkernel")

    if os.environ.get("FF_STAGE2_POOL", "0") == "1":
        # Pooled stage 2: the level-l block tent is piecewise-CONSTANT
        # within each 2^l-row pool block, so contracting it against t
        # equals contracting a plain level-l tent against t average-pooled
        # l times along y (floor semantics, exactly the `avg_pool2x2`
        # chain). Shrinks the stage-2 y-contractions from L*H2 to
        # sum_l H2/2^l rows (55+27+13+6 vs 220 at bench shapes).
        # MEASURED NEGATIVE (BENCH.md Finding 10): 26.85 vs 35.24 fps
        # (-24%) — the strided in-XLA pool slices relayout every level.
        # Kept opt-in: the row-shrink idea is right where pooling is free
        # (it rides again inside the Mosaic stage-2 kernel experiment).
        chunks = []
        for l, (hl, _) in enumerate(sizes):
            tl = t[..., l * k:(l + 1) * k]  # (B, Q, H2, K)
            n = h2
            for _ in range(l):
                n = n // 2
                tl = (tl[:, :, 0:2 * n:2] + tl[:, :, 1:2 * n:2]) * 0.5
            # plain level-l tent, hoisted-base build, no pool composition
            y = jnp.arange(hl, dtype=jnp.float32)
            base = cy[..., None] / (2.0 ** l) - y  # (B, Q, hl)
            sy_l = jnp.maximum(
                0.0, 1.0 - jnp.abs(base[..., :, None] + d)).astype(dtype)
            o = jnp.einsum("bqyj,bqyi->bqji", sy_l, tl[:, :, :hl],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            chunks.append(o)
        return tuple(chunks)

    chunks = []
    for l in range(num_levels):
        # o[b,q,j,i] = sum_y sy[b,q,y,j] * t[b,q,y,i] on this level's slice
        o = jnp.einsum("bqyj,bqyi->bqji",
                       sy_all[:, :, :, l * k:(l + 1) * k],
                       t[:, :, :, l * k:(l + 1) * k],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        chunks.append(o)
    return tuple(chunks)


def quantize_corr_q8(corr0: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-query-row int8 quantization of the all-pairs volume.

    Returns (c_i8 (B,Q,H2,W2) int8, scale (B,Q) f32) with
    corr ~= c_i8 * scale. Per-ROW scales keep the error relative to each
    query's own correlation range (a global scale would drown low-energy
    rows). The volume is stage 1's dominant HBM traffic (~99 MB/iteration
    bf16 at bench shapes); int8 halves it IF the stage-1 dot lowers to the
    MXU's native int8 path (measured on TPU before defaulting — this is
    the opt-in `FF_CORR_Q8` experiment).
    """
    amax = jnp.max(jnp.abs(corr0), axis=(2, 3))  # (B, Q) f32
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.round(corr0 / scale[:, :, None, None])
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale.astype(jnp.float32)


def _block_tent_weights_unscaled(pos: jnp.ndarray, level: int, size0: int,
                                 size_l: int) -> jnp.ndarray:
    """`_block_tent_weights` WITHOUT the 2^-level averaging factor —
    values stay in [0, 1] so int8 quantization keeps full resolution at
    every level; the 2^-level factor (an exact power of two) is folded
    into the stage-2 sy operand instead."""
    y = jnp.arange(size0, dtype=jnp.int32)
    yb = (y >> level).astype(jnp.float32)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - yb))
    if size_l << level < size0:
        tent = tent * (y < (size_l << level))
    return tent


def lookup_corr_fused_chunks_q8(
    corr_i8: jnp.ndarray,
    scale: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int,
    num_levels: int = 4,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, ...]:
    """`lookup_corr_fused_chunks` on an int8-quantized volume.

    Stage 1 runs int8 x int8 -> s32 (both operands quantized: the x tents
    are stored UNSCALED in [0,1] at 1/127 resolution, their 2^-level factor
    moves to stage 2 where multiplying bf16 by a power of two is exact).
    Stage 2 keeps bf16 MXU dots; the combined dequant factor
    scale[b,q] / 127 (the row max's /127 lives inside scale) lands as one
    fused per-chunk multiply.

    Error budget: tent quantization ~0.5/127 per tap over 2*2^l taps and
    row-relative volume quantization ~1/254 — ~1% of each row's max
    correlation end-to-end, validated in `tests/test_corr.py`. Eval-only
    by construction (wired behind FF_CORR_Q8 for non-train forwards).
    """
    b, q, h2, w2 = corr_i8.shape
    k = 2 * radius + 1
    sizes = _pool_sizes(h2, w2, num_levels)

    d = jnp.linspace(-radius, radius, k, dtype=jnp.float32)
    cx = coords[..., 0].reshape(b, q)
    cy = coords[..., 1].reshape(b, q)

    sx_all = jnp.concatenate(
        [
            _block_tent_weights_unscaled(cx[..., None] / (2.0 ** l) + d, l, w2, wl)
            for l, (_, wl) in enumerate(sizes)
        ],
        axis=-2,
    )  # (B, Q, L*K, W2) in [0, 1]
    sx_i8 = jnp.round(sx_all * 127.0).astype(jnp.int8)
    sy_all = jnp.concatenate(
        [
            _block_tent_weights_t(cy[..., None] / (2.0 ** l) + d, l, h2, hl)
            for l, (hl, _) in enumerate(sizes)
        ],
        axis=-1,
    ).astype(dtype)  # (B, Q, H2, L*K), carries its own 2^-l

    # stage 1 (MXU int8): t[b,q,y,(l,i)] = sum_x c_i8 * sx_i8  (s32 accum)
    t = jnp.einsum("bqyx,bqix->bqyi", corr_i8, sx_i8,
                   preferred_element_type=jnp.int32)
    t = t.astype(dtype)  # |t| <= 127^2 * 2^(l+1) ~ 2.6e5: bf16 rel err 0.4%

    # corr ~= c_i8 * scale (the /127 row normalization is INSIDE scale);
    # sx ~= sx_i8 / 127 — so exactly one 1/127 here
    deq = (scale / 127.0)[:, :, None, None]  # (B, Q, 1, 1) f32
    chunks = []
    for l in range(num_levels):
        o = jnp.einsum("bqyj,bqyi->bqji",
                       sy_all[:, :, :, l * k:(l + 1) * k] * (2.0 ** -l),
                       t[:, :, :, l * k:(l + 1) * k],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        chunks.append(o * deq)
    return tuple(chunks)


def lookup_corr_fused_chunks_q8s(
    corr_i8: jnp.ndarray,
    scale: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int,
    num_levels: int = 4,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, ...]:
    """int8-STORAGE variant of the Q8 lookup: the volume lives in HBM as
    int8 (half the stage-1 read bytes — the dominant ~99 MB/iter traffic)
    but the dot itself runs bf16: the s8->bf16 convert fuses into the
    stage-1 convolution fusion's operand read, so no bf16 copy of the
    volume ever exists in HBM. Tents stay bf16 (no per-iteration
    quantize/clip VPU passes — that cost made the full-int8 variant LOSE
    in-model: 24.5 vs 30.6 fps, BENCH.md round 4); the per-row dequant
    scale lands as one fused multiply on the tiny (B, Q, K, K) chunks.

    Accuracy is strictly better than `lookup_corr_fused_chunks_q8` (only
    the volume is quantized, ~0.4% row-relative).
    """
    b, q, h2, w2 = corr_i8.shape
    k = 2 * radius + 1
    sizes = _pool_sizes(h2, w2, num_levels)

    d = jnp.linspace(-radius, radius, k, dtype=jnp.float32)
    cx = coords[..., 0].reshape(b, q)
    cy = coords[..., 1].reshape(b, q)

    sx_all = jnp.concatenate(
        [
            _block_tent_weights(cx[..., None] / (2.0 ** l) + d, l, w2, wl)
            for l, (_, wl) in enumerate(sizes)
        ],
        axis=-2,
    ).astype(dtype)  # (B, Q, L*K, W2)
    sy_all = jnp.concatenate(
        [
            _block_tent_weights_t(cy[..., None] / (2.0 ** l) + d, l, h2, hl)
            for l, (hl, _) in enumerate(sizes)
        ],
        axis=-1,
    ).astype(dtype)  # (B, Q, H2, L*K)

    # stage 1 (MXU bf16): the s8 operand converts inside the fusion
    t = jnp.einsum("bqyx,bqix->bqyi", corr_i8.astype(dtype), sx_all,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(dtype)

    deq = scale[:, :, None, None]  # (B, Q, 1, 1) f32: corr ~= c_i8 * scale
    chunks = []
    for l in range(num_levels):
        o = jnp.einsum("bqyj,bqyi->bqji",
                       sy_all[:, :, :, l * k:(l + 1) * k],
                       t[:, :, :, l * k:(l + 1) * k],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        chunks.append(o * deq)
    return tuple(chunks)


def lookup_corr_fused_packed(
    corr0: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int,
    num_levels: int = 4,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused lookup emitting ONE packed (B, Q, L*K*K) tensor, with stage 2
    as a single VPU broadcast-multiply-reduce instead of per-level dots.

    MEASURED SLOWER in-model than `lookup_corr_fused_chunks` (26.6 vs 29.1
    fps, BENCH.md round 3): XLA lays the reduce fusion out Q-minor and
    relayouts both t (1.3 ms) and the sy build (1.1 ms) to feed it. Kept as
    a correctness-tested A/B variant and documentation of the negative.

    The per-level stage-2 dots produce (B, Q, K, K) outputs whose K=9 minor
    dims tile terribly on TPU (lanes pad 9->128); profiling showed the dots
    + the relayout copies their consumers forced cost ~0.34 ms/iteration
    against a ~0.07 ms memory roofline. Here the diagonal-block contraction
    o[q, (l,j,i)] = sum_y sy_l[q,y,j] * t_l[q,y,i] is one fused
    broadcast-multiply with an f32-accumulating sum over y: XLA keeps it a
    single reduce fusion reading t once and writing the packed (B, Q, 324)
    layout every consumer wants (channels minor).

    Channel packing is l*K*K + j*K + i (j = y-offset SLOW); the reference
    order is l*K*K + i*K + j (`corr.py:39-43`) — consumers fold the reorder
    into their first 1x1 conv kernel (`nn.update.ChunkFoldedConv1x1`).
    """
    b, q, h2, w2 = corr0.shape
    k = 2 * radius + 1
    sizes = _pool_sizes(h2, w2, num_levels)

    d = jnp.linspace(-radius, radius, k, dtype=jnp.float32)
    cx = coords[..., 0].reshape(b, q)
    cy = coords[..., 1].reshape(b, q)

    sx_all = jnp.concatenate(
        [
            _block_tent_weights(cx[..., None] / (2.0 ** l) + d, l, w2, wl)
            for l, (_, wl) in enumerate(sizes)
        ],
        axis=-2,
    ).astype(dtype)  # (B, Q, L*K, W2)
    sy_all = jnp.concatenate(
        [
            _block_tent_weights_t(cy[..., None] / (2.0 ** l) + d, l, h2, hl)
            for l, (hl, _) in enumerate(sizes)
        ],
        axis=-1,
    ).astype(dtype)  # (B, Q, H2, L*K)

    c = corr0.astype(dtype)
    # stage 1 (MXU): t[b,q,y,(l,i)] = sum_x corr[b,q,y,x] * sx[b,q,(l,i),x]
    t = jnp.einsum("bqyx,bqix->bqyi", c, sx_all,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(dtype)

    # stage 2 (VPU): broadcast both operands to (B, Q, H2, L, K, K) and
    # f32-accumulate over y — broadcasts stay inside the reduce fusion
    sy_b = sy_all.reshape(b, q, h2, num_levels, k, 1)  # j slow
    t_b = t.reshape(b, q, h2, num_levels, 1, k)        # i fast
    o = jnp.sum(
        (sy_b * t_b).astype(jnp.float32),
        axis=2,
    )  # (B, Q, L, K, K)
    return o.reshape(b, q, num_levels * k * k).astype(dtype)


def lookup_corr_fused_full(
    corr0: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int,
    num_levels: int = 4,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused lookup emitting the FULL (B, Q, LK, LK) stage-2 cross product.

    Only the L diagonal (level-matching) KxK blocks are meaningful; instead
    of extracting them (slices/transposes/relayouts — the round-2 tax) or
    running per-level dots (K=9 lane starvation — the round-3 chunk form's
    residual copies), the consumer contracts the whole (LK, LK) output
    against a BLOCK-SPARSE folded convc1 kernel
    (`nn.update.ChunkFoldedConv1x1`): 4x the convc1 contraction FLOPs,
    which is noise on the MXU, and zero data-movement ops.

    o[b, q, ja, ia] = sum_y sy[b,q,y,ja] * t[b,q,y,ia]; the meaningful
    entries are level(ja) == level(ia) with j = y-offset, i = x-offset.
    """
    b, q, h2, w2 = corr0.shape
    k = 2 * radius + 1
    sizes = _pool_sizes(h2, w2, num_levels)

    d = jnp.linspace(-radius, radius, k, dtype=jnp.float32)
    cx = coords[..., 0].reshape(b, q)
    cy = coords[..., 1].reshape(b, q)

    sx_all = jnp.concatenate(
        [
            _block_tent_weights(cx[..., None] / (2.0 ** l) + d, l, w2, wl)
            for l, (_, wl) in enumerate(sizes)
        ],
        axis=-2,
    ).astype(dtype)  # (B, Q, L*K, W2)
    sy_all = jnp.concatenate(
        [
            _block_tent_weights_t(cy[..., None] / (2.0 ** l) + d, l, h2, hl)
            for l, (hl, _) in enumerate(sizes)
        ],
        axis=-1,
    ).astype(dtype)  # (B, Q, H2, L*K)

    c = corr0.astype(dtype)
    t = jnp.einsum("bqyx,bqix->bqyi", c, sx_all,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(dtype)
    o = jnp.einsum("bqyj,bqyi->bqji", sy_all, t,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return o.astype(dtype)  # (B, Q, LK_j, LK_i)


def alternate_corr_lookup(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    coords: jnp.ndarray,
    radius: int,
    num_levels: int = 4,
    chunk: int = 2048,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, ...]:
    """Memory-lean windowed correlation straight from the feature maps.

    TPU-native AlternateCorrBlock (reference
    `/root/reference/core/models/ff-raft/FF_RAFT_Core/corr.py:63-91`, the
    opt-in CUDA path behind `ALT_CORR`): never materializes the O((HW)^2)
    all-pairs volume. Instead of the reference's per-query CUDA window
    kernel — a gather, which serializes on TPU — this recomputes the
    volume CHUNK-WISE on the MXU every iteration and immediately collapses
    each (chunk, H2, W2) slice through the pool-composed fused lookup
    (`lookup_corr_fused_chunks`), so peak extra memory is
    O(chunk * H2 * W2) regardless of resolution. Recompute cost is one
    (Q, C) @ (C, H2W2) matmul per iteration — MXU food; at bench shapes
    ~0.2 ms/iter vs a materialized volume that stops fitting HBM at
    ~2Kx1K frames (BENCH.md round 3).

    fmap1: (B, H1, W1, C) or (B, Q, C); fmap2: (B, H2, W2, C).
    Returns the same per-level (B, Q, K, K) chunk tuple as
    `lookup_corr_fused_chunks` — bit-identical consumers.
    """
    b = fmap1.shape[0]
    c = fmap1.shape[-1]
    f1 = fmap1.reshape(b, -1, c).astype(dtype)
    q = f1.shape[1]
    h2, w2 = fmap2.shape[1:3]
    f2 = fmap2.reshape(b, h2 * w2, c).astype(dtype)
    coords_q = coords.reshape(b, q, 1, 2)
    inv_sqrt_c = 1.0 / float(c) ** 0.5

    n_chunks = -(-q // chunk)
    pad = n_chunks * chunk - q
    if pad:
        f1 = jnp.pad(f1, ((0, 0), (0, pad), (0, 0)))
        coords_q = jnp.pad(coords_q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    f1 = f1.reshape(b, n_chunks, chunk, c).transpose(1, 0, 2, 3)
    coords_s = coords_q.reshape(b, n_chunks, chunk, 1, 2).transpose(1, 0, 2, 3, 4)

    def body(_, xs):
        f1_c, coords_c = xs
        corr_c = jnp.einsum("bqc,bpc->bqp", f1_c, f2,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        corr_c = (corr_c * inv_sqrt_c).astype(dtype).reshape(b, chunk, h2, w2)
        outs = lookup_corr_fused_chunks(corr_c, coords_c, radius,
                                        num_levels=num_levels, dtype=dtype,
                                        marker_ok=False)
        return None, outs

    _, stacked = jax.lax.scan(body, None, (f1, coords_s))
    # (n_chunks, B, chunk, K, K) per level -> (B, Q, K, K)
    k = 2 * radius + 1
    chunks = []
    for lv in stacked:
        lv = jnp.moveaxis(lv, 0, 1).reshape(b, n_chunks * chunk, k, k)
        chunks.append(lv[:, :q])
    return tuple(chunks)


def lookup_corr_pyramid(
    pyramid: CorrPyramid, coords: jnp.ndarray, impl: str = "auto",
    num_levels: int = 4,
) -> jnp.ndarray:
    """Look up the (2r+1)^2 window at `coords` on every level, concat channels.

    coords: (B, H1, W1, 2) level-0 pixel coordinates, (x, y) order.
    Returns (B, H1, W1, L*(2r+1)^2), levels ordered fine-to-coarse — the NHWC
    equivalent of the reference CorrBlock.__call__ (`corr.py:29-50`).

    impl:
      'auto'   — 'fused' when the pyramid holds only level 0, else 'mxu'
      'xla'    — gather-based (exact f32; reference for parity tests)
      'mxu'    — per-level tent-weight batched matmuls, bf16/f32-accum
      'fused'  — all levels as one matmul pair on level 0 (`lookup_corr_fused`;
                 requires a pyramid built with `fused=True`, i.e. levels==(corr0,))
      'pallas' — Pallas patch-extraction kernel. Measured SLOWER than 'mxu'
                 on v5e (BENCH.md round 2): per-query dynamic rolls can't
                 beat batched MXU work at these shapes; kept as the
                 AlternateCorrBlock-style memory-lean option.
    """
    if impl == "auto":
        impl = "fused" if len(pyramid.levels) == 1 and num_levels > 1 else "mxu"
    if impl == "fused":
        assert len(pyramid.levels) == 1, "fused lookup wants the unpooled volume"
        return lookup_corr_fused(pyramid.levels[0], coords, pyramid.radius,
                                 num_levels=num_levels)
    assert len(pyramid.levels) == num_levels, (
        f"pyramid has {len(pyramid.levels)} levels, expected num_levels="
        f"{num_levels} (build with matching num_levels, or fused=True for "
        "the 'fused' impl)")
    if impl == "pallas":
        return lookup_corr_pyramid_pallas(pyramid.levels, coords, pyramid.radius)
    outs = []
    for i, corr_l in enumerate(pyramid.levels):
        if impl == "mxu":
            outs.append(_lookup_level_mxu(corr_l, coords / (2.0**i), pyramid.radius))
        else:
            outs.append(_lookup_level(corr_l, coords / (2.0**i), pyramid.radius))
    return jnp.concatenate(outs, axis=-1)
