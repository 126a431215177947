"""RAFT iterative update blocks: motion encoders, ConvGRU variants, FlowHead.

NHWC equivalents of the reference update modules
(`/root/reference/core/models/ff-raft/FF_RAFT_Core/update.py`). These run
inside the `lax.scan` refinement loop, so every conv here is on the training
and inference hot path; XLA fuses the gate nonlinearities into the convs.

Init: torch Conv2d DEFAULTS (`blocks.torch_default`) — the reference's
kaiming init loops live in the encoders (`extractor.py:150-157`,
`parallel_fusion.py:193-195`); update.py modules are left at torch
defaults there, and the FlowFormer decoder/GRU (which reuses FlowHead and
SepConvGRU here) likewise. Kaiming fan-out on the flow head inflated the
init-time per-iteration delta-flow ~25x (cf. the PWC init collapse,
tests/test_pwc_init.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import conv2d, torch_bias_init, torch_default


class ChunkFoldedConv1x1(nn.Module):
    """convc1 applied directly to the fused lookup's per-level (B, Q, K, K)
    query-space chunks (`ops.corr.lookup_corr_fused_chunks`).

    Parameter tree ({kernel, bias}, same shapes/inits/order as a plain
    `conv2d` convc1 over reference-ordered NHWC corr) is checkpoint-identical;
    the packed->reference channel reorder AND the (B,Q,9,9)->(B,H,W,81)
    reshape are folded into loop-invariant *kernel* reshapes: each level
    contracts its (j, i) window against the matching kernel block
    W[l*K2 + i*K + j, :] — zero per-iteration activation relayout
    (round-3 profile: the NHWC repack cost ~0.5 ms/iteration).
    """

    features: int
    corr_levels: int
    corr_radius: int
    dtype: jnp.dtype = jnp.float32
    fold_impl: str = "xla"

    @nn.compact
    def __call__(self, chunks) -> jnp.ndarray:
        k = 2 * self.corr_radius + 1
        cin, cout = self.corr_levels * k * k, self.features
        kernel = self.param("kernel", torch_default, (1, 1, cin, cout), jnp.float32)
        bias = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: torch_bias_init(key, shape, dtype, cin),
            (cout,), jnp.float32)
        w = kernel[0, 0]  # (cin, cout), rows ordered l, then i slow, j fast
        d = self.dtype
        if isinstance(chunks, tuple) and chunks and chunks[0] == "full36":
            # FF_STAGE2_FULLFOLD (round-5 Finding 12): the lookup handed us
            # the full (B, Q, LK, LK) stage-2 product; fold it with the
            # zero-expanded block-diagonal kernel (`kernels.fold`).
            from ..kernels.fold import fold_full_conv

            _, o_full, levels, kk = chunks
            return fold_full_conv(o_full, w, bias, d, levels, kk)
        if isinstance(chunks, tuple) and chunks and chunks[0] == "stage2k":
            # Mosaic stage-2+fold kernel experiment (`FF_STAGE2_KERNEL`,
            # BENCH.md Finding 11): the lookup handed us stage 1's t and
            # the query y-coords; the kernel does the rest (q-minor VMEM
            # tents + fused folded convc1, kernels/stage2.py).
            from ..kernels.stage2 import stage2_fold

            _, t, cy, sizes, radius, pre_t = chunks
            idx = [l * k * k + i * k + j
                   for l in range(self.corr_levels)
                   for j in range(k) for i in range(k)]
            wp = w[jnp.asarray(idx)].astype(d)
            return stage2_fold(t, cy, wp, bias.astype(jnp.float32),
                               radius, sizes, dtype=d,
                               transpose_in_kernel=not pre_t)
        if isinstance(chunks, tuple):
            import os

            # Pallas fold kernel (kernels/fold.py): consumes the stage-2
            # chunks in the row-major layout they are produced in (the
            # Pallas operand pin == the existing layout, so it costs
            # nothing) and runs one K=L*K2 MXU dot per query tile.
            # Measured +1.2% fps at the bench protocol (BENCH.md Finding
            # 10) -> DEFAULT on the eval/fused lookup path (`fold_impl=
            # "pallas"`, set by the model when the lookup resolves to
            # 'fused'); the training graph keeps XLA (unmeasured there —
            # a Mosaic custom call in the backward risks the Finding 4
            # layout veto). FF_PALLAS_FOLD=1/0 force-overrides both ways.
            default = "1" if self.fold_impl == "pallas" else "0"
            if os.environ.get("FF_PALLAS_FOLD", default) == "1":
                from ..kernels.fold import fold_chunks_conv

                return fold_chunks_conv(chunks, w, bias, d)
            if os.environ.get("FF_CHUNK_DOT", "perlevel") == "packed":
                # Round-4 attack on the 4 x 0.44 ms chunk relayout copies
                # ({2,1,0}->{0,1,2} before the per-level dots, xprof):
                # flatten each (B, Q, K, K) chunk to (B, Q, K2), concat
                # minor-wise, and contract ALL levels in ONE
                # (B*Q, L*K2) @ (L*K2, cout) dot. Kernel rows reordered
                # loop-invariantly to the chunk (l, j, i) packing (the
                # param stays reference-ordered l, i, j).
                # MEASURED A TIE (30.621 vs 30.607 fps): the reshape to
                # (B, Q, 81) re-inserts the same layout change the dots
                # forced — the copies are XLA's dot-layout preference, not
                # the per-level loop structure. Kept opt-in for the record.
                b, q = chunks[0].shape[:2]
                packed = jnp.concatenate(
                    [ch.astype(d).reshape(b, q, k * k) for ch in chunks],
                    axis=-1)
                idx = [l * k * k + i * k + j
                       for l in range(self.corr_levels)
                       for j in range(k) for i in range(k)]
                wp = w[jnp.asarray(idx)]  # (L*K2, cout), (l, j, i) order
                y = jnp.einsum("bqc,co->bqo", packed, wp.astype(d),
                               precision=jax.lax.Precision.HIGHEST)
                return y + bias.astype(d)
            # default: one (B,Q,81)@(81,256)-shaped dot per level.
            acc = None
            for l, ch in enumerate(chunks):
                wl = w[l * k * k:(l + 1) * k * k].reshape(k, k, cout)
                y = jnp.einsum("bqji,ijo->bqo", ch.astype(d), wl.astype(d),
                               precision=jax.lax.Precision.HIGHEST)
                acc = y if acc is None else acc + y
            return acc + bias.astype(d)
        if chunks.ndim == 4:
            # full (B, Q, LK, LK) stage-2 product: contract against the
            # block-diagonal folded kernel — only level(ja)==level(ia)
            # entries are meaningful, the rest hit zero weights. 4x the
            # convc1 FLOPs (noise on the MXU), zero extraction ops.
            lk = self.corr_levels * k
            wl = jnp.zeros((lk, lk, cout), jnp.float32)
            for l in range(self.corr_levels):
                blk = w[l * k * k:(l + 1) * k * k].reshape(k, k, cout)  # [i, j, o]
                wl = wl.at[l * k:(l + 1) * k, l * k:(l + 1) * k].set(
                    blk.transpose(1, 0, 2))
            y = jnp.einsum("bqji,jio->bqo", chunks.astype(d), wl.astype(d),
                           precision=jax.lax.Precision.HIGHEST)
            return y + bias.astype(d)
        # packed (B, Q, L*K*K) in (l, j, i) order: the packed->reference
        # permutation is an involution, so indexing W with it maps either way
        from ..ops.corr import packed_to_reference_perm

        perm = jnp.asarray(packed_to_reference_perm(self.corr_levels,
                                                    self.corr_radius))
        y = jnp.einsum("bqc,co->bqo", chunks.astype(d), w[perm].astype(d),
                       precision=jax.lax.Precision.HIGHEST)
        return y + bias.astype(d)


class FlowHead(nn.Module):
    input_dim: int = 128
    hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        x = conv2d(self.hidden_dim, 3, 1, 1, name="conv1", dtype=d, in_features=self.input_dim, kernel_init=torch_default)(x)
        x = nn.relu(x)
        return conv2d(2, 3, 1, 1, name="conv2", dtype=d, in_features=self.hidden_dim, kernel_init=torch_default)(x)


def _fused_zr() -> bool:
    """The z/r gates convolve the same cat(h, x); fusing their kernels into
    one conv (trace-time concat — loop-invariant, hoisted out of the scan)
    halves the hx reads and widens the MXU output tile. Measured +1% fps at
    the bench protocol (30.92 vs 30.61); math and param tree are identical
    to separate convs (verified exact). FF_GRU_ZR=separate opts out."""
    import os

    return os.environ.get("FF_GRU_ZR", "fused") != "separate"


def _zr_gates(hx, kern, pad, cin, hd, d, name_z, name_r):
    """One fused conv producing both gate pre-activations; params live in
    child scopes `name_z`/`name_r` with nn.Conv's exact {kernel, bias}
    names, shapes and inits — checkpoint-identical to two `conv2d`s."""
    kz, bz = _ConvParams((*kern, cin, hd), name=name_z)()
    kr, br = _ConvParams((*kern, cin, hd), name=name_r)()
    zr = jax.lax.conv_general_dilated(
        hx.astype(d),
        jnp.concatenate([kz, kr], axis=-1).astype(d),
        window_strides=(1, 1),
        padding=((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + jnp.concatenate([bz, br]).astype(d)
    return nn.sigmoid(zr[..., :hd]), nn.sigmoid(zr[..., hd:])


class ConvGRU(nn.Module):
    hidden_dim: int = 128
    input_dim: int = 192 + 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        cin = self.hidden_dim + self.input_dim
        hx = jnp.concatenate([h, x], axis=-1)
        if _fused_zr():
            z, r = _zr_gates(hx, (3, 3), (1, 1), cin, self.hidden_dim, d,
                             "convz", "convr")
        else:
            z = nn.sigmoid(conv2d(self.hidden_dim, 3, 1, 1, name="convz", dtype=d, in_features=cin, kernel_init=torch_default)(hx))
            r = nn.sigmoid(conv2d(self.hidden_dim, 3, 1, 1, name="convr", dtype=d, in_features=cin, kernel_init=torch_default)(hx))
        q = nn.tanh(
            conv2d(self.hidden_dim, 3, 1, 1, name="convq", dtype=d, in_features=cin, kernel_init=torch_default)(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1 - z) * h + z * q


class _ConvParams(nn.Module):
    """Bare {kernel, bias} param holder with nn.Conv's exact names, shapes and
    inits — lets a parent fuse several convs' kernels into one
    `lax.conv_general_dilated` call while keeping the checkpoint tree
    identical to separate `conv2d` modules."""

    kernel_shape: Tuple[int, int, int, int]  # (kh, kw, cin, cout)

    @nn.compact
    def __call__(self):
        kh, kw, cin, cout = self.kernel_shape
        kernel = self.param("kernel", torch_default, self.kernel_shape,
                            jnp.float32)
        fan_in = cin * kh * kw
        bias = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: torch_bias_init(
                key, shape, dtype, fan_in),
            (cout,), jnp.float32)
        return kernel, bias


class SepConvGRU(nn.Module):
    """Separable GRU: a horizontal (1x5) pass then a vertical (5x1) pass.

    The z/r gate convs are fused into one conv by default (`_fused_zr`,
    measured +1% fps; param tree and math identical to the reference's
    separate gate convs, `update.py:33-60`)."""

    hidden_dim: int = 128
    input_dim: int = 192 + 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        hd = self.hidden_dim
        cin = hd + self.input_dim
        fused_zr = _fused_zr()

        for suffix, kern, pad in (("1", (1, 5), (0, 2)), ("2", (5, 1), (2, 0))):
            hx = jnp.concatenate([h, x], axis=-1)
            if fused_zr:
                z, r = _zr_gates(hx, kern, pad, cin, hd, d,
                                 f"convz{suffix}", f"convr{suffix}")
            else:
                z = nn.sigmoid(conv2d(hd, kern, 1, pad, name=f"convz{suffix}", dtype=d, in_features=cin, kernel_init=torch_default)(hx))
                r = nn.sigmoid(conv2d(hd, kern, 1, pad, name=f"convr{suffix}", dtype=d, in_features=cin, kernel_init=torch_default)(hx))
            q = nn.tanh(
                conv2d(hd, kern, 1, pad, name=f"convq{suffix}", dtype=d, in_features=cin, kernel_init=torch_default)(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1 - z) * h + z * q
        return h


def _convc1(features, corr_levels, corr_radius, dtype, flow, corr,
            fold_impl="xla"):
    """First motion-encoder conv: plain NHWC 1x1 for array corr, or the
    kernel-folded query-space form when corr arrives as fused-lookup chunks
    (tuple of (B, Q, K, K)); the (B, Q, F) result reshapes to NHWC for free
    (F is the minor dim both ways)."""
    cor_planes = corr_levels * (2 * corr_radius + 1) ** 2
    # query-space forms: chunk tuple, packed (B,Q,LKK), or full (B,Q,LK,LK)
    if isinstance(corr, tuple) or corr.ndim == 3 or corr.shape[-1] != cor_planes:
        b, h, w = flow.shape[:3]
        cor = ChunkFoldedConv1x1(features, corr_levels, corr_radius,
                                 name="convc1", dtype=dtype,
                                 fold_impl=fold_impl)(corr)
        return cor.reshape(b, h, w, features)
    return conv2d(features, 1, 1, 0, name="convc1", dtype=dtype,
                  in_features=cor_planes, kernel_init=torch_default)(corr)


class SmallMotionEncoder(nn.Module):
    corr_levels: int
    corr_radius: int
    dtype: jnp.dtype = jnp.float32
    fold_impl: str = "xla"

    @nn.compact
    def __call__(self, flow: jnp.ndarray, corr) -> jnp.ndarray:
        d = self.dtype
        cor = nn.relu(_convc1(96, self.corr_levels, self.corr_radius, d,
                              flow, corr, self.fold_impl))
        flo = nn.relu(conv2d(64, 7, 1, 3, name="convf1", dtype=d, in_features=2, kernel_init=torch_default)(flow))
        flo = nn.relu(conv2d(32, 3, 1, 1, name="convf2", dtype=d, in_features=64, kernel_init=torch_default)(flo))
        out = nn.relu(
            conv2d(80, 3, 1, 1, name="conv", dtype=d, in_features=128, kernel_init=torch_default)(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class BasicMotionEncoder(nn.Module):
    corr_levels: int
    corr_radius: int
    dtype: jnp.dtype = jnp.float32
    fold_impl: str = "xla"

    @nn.compact
    def __call__(self, flow: jnp.ndarray, corr) -> jnp.ndarray:
        d = self.dtype
        cor = nn.relu(_convc1(256, self.corr_levels, self.corr_radius, d,
                              flow, corr, self.fold_impl))
        cor = nn.relu(conv2d(192, 3, 1, 1, name="convc2", dtype=d, in_features=256, kernel_init=torch_default)(cor))
        flo = nn.relu(conv2d(128, 7, 1, 3, name="convf1", dtype=d, in_features=2, kernel_init=torch_default)(flow))
        flo = nn.relu(conv2d(64, 3, 1, 1, name="convf2", dtype=d, in_features=128, kernel_init=torch_default)(flo))
        out = nn.relu(
            conv2d(128 - 2, 3, 1, 1, name="conv", dtype=d, in_features=64 + 192, kernel_init=torch_default)(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class SmallUpdateBlock(nn.Module):
    corr_levels: int
    corr_radius: int
    hidden_dim: int = 96
    dtype: jnp.dtype = jnp.float32
    fold_impl: str = "xla"

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        d = self.dtype
        motion = SmallMotionEncoder(self.corr_levels, self.corr_radius,
                                    name="encoder", dtype=d,
                                    fold_impl=self.fold_impl)(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, 82 + 64, name="gru", dtype=d)(net, inp)
        delta_flow = FlowHead(self.hidden_dim, 128, name="flow_head", dtype=d)(net)
        return net, None, delta_flow


class BasicUpdateBlock(nn.Module):
    corr_levels: int
    corr_radius: int
    hidden_dim: int = 128
    dtype: jnp.dtype = jnp.float32
    fold_impl: str = "xla"

    @nn.compact
    def __call__(self, net, inp, corr, flow, mask_needed=None):
        """mask_needed: None -> always compute the upsample mask; a traced
        bool -> compute it only when true (test mode needs the mask on the
        FINAL refinement iteration only — the head is ~6 GFLOP/iteration at
        bench shapes, wasted 11/12 times otherwise)."""
        d = self.dtype
        motion = BasicMotionEncoder(self.corr_levels, self.corr_radius,
                                    name="encoder", dtype=d,
                                    fold_impl=self.fold_impl)(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, 128 + self.hidden_dim, name="gru", dtype=d)(net, inp)
        delta_flow = FlowHead(self.hidden_dim, 256, name="flow_head", dtype=d)(net)

        # 0.25x scale balances gradients into the upsample mask (`update.py:134`).
        mask0 = conv2d(256, 3, 1, 1, name="mask_0", dtype=d, in_features=128, kernel_init=torch_default)
        mask2 = conv2d(64 * 9, 1, 1, 0, name="mask_2", dtype=d, in_features=256, kernel_init=torch_default)

        def mask_head(h):
            return 0.25 * mask2(nn.relu(mask0(h)))

        if mask_needed is None:
            up_mask = mask_head(net)
        else:
            # create the params unconditionally (flax can't create variables
            # inside lax.cond branches); the tiny call is dead code at runtime
            _ = mask_head(net[:, :1, :1, :])
            up_mask = jax.lax.cond(
                mask_needed, mask_head, lambda h: jnp.zeros(
                    net.shape[:3] + (64 * 9,), d), net)
        return net, up_mask, delta_flow
