"""Pallas kernel unit tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from focusflow_official_tpu.kernels.instance_norm import (
    _forward,
    _xla_instance_norm,
    instance_norm_pallas,
)

RNG = np.random.RandomState(9)


class TestInstanceNormKernel:
    @pytest.mark.parametrize("shape,relu", [
        ((2, 20, 24, 64), False),
        ((2, 20, 24, 64), True),
        ((1, 13, 17, 96), True),   # odd HW: tail-chunk masking
        ((1, 9, 11, 128), False),
    ])
    def test_matches_xla(self, shape, relu):
        x = jnp.asarray(RNG.randn(*shape).astype(np.float32) * 3 + 1)
        want = np.asarray(_xla_instance_norm(x, 1e-5, relu))
        got = np.asarray(_forward(x, 1e-5, relu, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_bf16(self):
        x = jnp.asarray(RNG.randn(1, 16, 16, 64).astype(np.float32)).astype(jnp.bfloat16)
        want = np.asarray(_xla_instance_norm(x, 1e-5, True).astype(jnp.float32))
        got = np.asarray(_forward(x, 1e-5, True, interpret=True).astype(jnp.float32))
        np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-2)

    def test_grad_matches_xla_autodiff(self):
        x = jnp.asarray(RNG.randn(1, 8, 8, 64).astype(np.float32))

        def loss_pallas(x):
            return jnp.sum(jnp.sin(instance_norm_pallas(x, 1e-5, True)))

        def loss_xla(x):
            return jnp.sum(jnp.sin(_xla_instance_norm(x, 1e-5, True)))

        g1 = np.asarray(jax.grad(loss_pallas)(x))
        g2 = np.asarray(jax.grad(loss_xla)(x))
        np.testing.assert_allclose(g1, g2, atol=1e-4, rtol=1e-4)


class TestInstanceNormStats:
    def test_values_and_grads_match_xla(self):
        from focusflow_official_tpu.kernels.instance_norm import (
            instance_norm_stats,
        )

        x = jnp.asarray(RNG.randn(2, 12, 14, 64).astype(np.float32) * 2 + 1)

        def norm_stats(x):
            mean, inv = instance_norm_stats(x, 1e-5)
            return jnp.sum(jnp.sin((x - mean) * inv))

        def norm_xla(x):
            return jnp.sum(jnp.sin(_xla_instance_norm(x, 1e-5, False)))

        np.testing.assert_allclose(float(norm_stats(x)), float(norm_xla(x)),
                                   rtol=1e-5)
        g1 = np.asarray(jax.grad(norm_stats)(x))
        g2 = np.asarray(jax.grad(norm_xla)(x))
        np.testing.assert_allclose(g1, g2, atol=1e-4, rtol=1e-4)


class TestLocalCorrKernel:
    """Pallas PWC local correlation vs the XLA shift formulation."""

    @pytest.mark.parametrize("shape,r", [
        ((2, 12, 16, 32), 4),
        ((1, 9, 13, 24), 3),  # odd sizes, non-128 channels
    ])
    def test_matches_xla(self, shape, r):
        from focusflow_official_tpu.ops.local_corr import local_corr
        from focusflow_official_tpu.ops.pallas_local_corr import _forward

        f1 = jnp.asarray(RNG.randn(*shape).astype(np.float32))
        f2 = jnp.asarray(RNG.randn(*shape).astype(np.float32))
        want = np.asarray(local_corr(f1, f2, r))
        got = np.asarray(_forward(f1, f2, r, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_custom_vjp_grads(self):
        from focusflow_official_tpu.ops.local_corr import local_corr
        from focusflow_official_tpu.ops.pallas_local_corr import local_corr_pallas

        f1 = jnp.asarray(RNG.randn(1, 8, 10, 16).astype(np.float32))
        f2 = jnp.asarray(RNG.randn(1, 8, 10, 16).astype(np.float32))
        # off-TPU local_corr_pallas falls back to XLA, so this exercises the
        # custom_vjp wrapper's backward wiring
        g1 = jax.grad(lambda a, b: jnp.sum(jnp.sin(local_corr_pallas(a, b, 4))),
                      argnums=(0, 1))(f1, f2)
        g2 = jax.grad(lambda a, b: jnp.sum(jnp.sin(local_corr(a, b, 4))),
                      argnums=(0, 1))(f1, f2)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)


class TestFusedAttentionKernel:
    """kernels/attention.py: single-pass small-kv attention."""

    @pytest.mark.parametrize("b,n,m,c,heads", [
        (2, 700, 28, 64, 8),    # n not a multiple of the block: pad path
        (1, 512, 448, 128, 8),  # bench-like vertical-global shape (scaled)
        (3, 100, 100, 96, 4),   # square attention, odd sizes
    ])
    def test_matches_xla(self, b, n, m, c, heads):
        from focusflow_official_tpu.kernels.attention import (
            _forward, _xla_attention)

        q = jnp.asarray(RNG.randn(b, n, c).astype(np.float32))
        k = jnp.asarray(RNG.randn(b, m, c).astype(np.float32))
        v = jnp.asarray(RNG.randn(b, m, c).astype(np.float32))
        scale = (c / heads) ** -0.5
        want = np.asarray(_xla_attention(q, k, v, heads, scale))
        got = np.asarray(_forward(q, k, v, heads, scale, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_custom_vjp_matches_xla_grads(self):
        from focusflow_official_tpu.kernels.attention import (
            _attention_bwd, _xla_attention)

        b, n, m, c, heads = 2, 40, 12, 32, 4
        scale = (c / heads) ** -0.5
        q = jnp.asarray(RNG.randn(b, n, c).astype(np.float32))
        k = jnp.asarray(RNG.randn(b, m, c).astype(np.float32))
        v = jnp.asarray(RNG.randn(b, m, c).astype(np.float32))
        g = jnp.asarray(RNG.randn(b, n, c).astype(np.float32))

        def loss(q, k, v):
            return jnp.sum(_xla_attention(q, k, v, heads, scale) * g)

        want = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        got = _attention_bwd(heads, scale, (q, k, v), g)
        for w, o in zip(want, got):
            np.testing.assert_allclose(np.asarray(o), np.asarray(w),
                                       atol=1e-4, rtol=1e-4)


class TestFoldKernel:
    """kernels/fold.py: chunk-layout-native folded convc1 (`FF_PALLAS_FOLD`)."""

    def _chunks(self, b=2, q=600, k=9, levels=4):
        return tuple(
            jnp.asarray(RNG.randn(b, q, k, k).astype(np.float32))
            for _ in range(levels))

    def test_matches_chunk_folded_conv(self):
        """Kernel (interpret mode) == the default per-level XLA fold on the
        same reference-ordered weights, incl. the q-padding tail path."""
        from focusflow_official_tpu.kernels import fold
        from focusflow_official_tpu.nn.update import ChunkFoldedConv1x1

        chunks = self._chunks(q=600)  # 600 % 512 != 0: exercises the pad
        cin, cout = 4 * 81, 96
        w = jnp.asarray(RNG.randn(cin, cout).astype(np.float32) * 0.1)
        bias = jnp.asarray(RNG.randn(cout).astype(np.float32))

        mod = ChunkFoldedConv1x1(features=cout, corr_levels=4, corr_radius=4)
        variables = {"params": {"kernel": w.reshape(1, 1, cin, cout),
                                "bias": bias}}
        want = np.asarray(mod.apply(variables, chunks))

        saved = fold._INTERPRET
        fold._INTERPRET = True
        try:
            got = np.asarray(fold.fold_chunks_conv(
                chunks, w, bias, jnp.float32))
        finally:
            fold._INTERPRET = saved
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_custom_vjp_matches_xla_grads(self):
        """`_fold`'s custom_vjp == autodiff through the plain XLA fold."""
        from focusflow_official_tpu.kernels import fold

        b, q, cin, cout = 1, 520, 324, 64
        packed = jnp.asarray(RNG.randn(b, q, cin).astype(np.float32))
        w = jnp.asarray(RNG.randn(cin, cout).astype(np.float32) * 0.1)
        bias = jnp.asarray(RNG.randn(cout).astype(np.float32))
        g = jnp.asarray(RNG.randn(b, q, cout).astype(np.float32))

        def loss_xla(p, w, bias):
            return jnp.sum(fold._xla_fold(p, w, bias, jnp.float32) * g)

        def loss_kernel(p, w, bias):
            return jnp.sum(fold._fold(p, w, bias, jnp.float32) * g)

        want = jax.grad(loss_xla, argnums=(0, 1, 2))(packed, w, bias)
        saved = fold._INTERPRET
        fold._INTERPRET = True
        try:
            got = jax.grad(loss_kernel, argnums=(0, 1, 2))(packed, w, bias)
        finally:
            fold._INTERPRET = saved
        for name, (o, e) in zip(("dpacked", "dw", "dbias"), zip(got, want)):
            np.testing.assert_allclose(np.asarray(o), np.asarray(e),
                                       atol=1e-4, rtol=1e-4, err_msg=name)


class TestStage2Kernel:
    """kernels/stage2.py: fused q-minor stage-2 + folded convc1
    (`FF_STAGE2_KERNEL`, BENCH.md Finding 11)."""

    @pytest.mark.parametrize("transpose_in_kernel", [True, False])
    def test_matches_production_stage2_plus_fold(self, transpose_in_kernel):
        """Kernel (interpret mode, f32) == production fused-chunk lookup
        (`lookup_corr_fused_chunks`) followed by `ChunkFoldedConv1x1`,
        from the same level-0 volume — covers the block-tent math (incl.
        pooled-away-row masking), the (l, j, i) weight permutation, and
        the q-padding tail (Q=390 % 128 != 0)."""
        from focusflow_official_tpu.kernels import stage2
        from focusflow_official_tpu.nn.update import ChunkFoldedConv1x1
        from focusflow_official_tpu.ops.corr import (
            _block_tent_weights_base, _pool_sizes, lookup_corr_fused_chunks)

        b, h2, w2, r, levels, cout = 1, 15, 26, 3, 3, 64
        k2 = (2 * r + 1) ** 2
        q = h2 * w2
        corr0 = jnp.asarray(RNG.randn(b, q, h2, w2).astype(np.float32))
        cx = RNG.rand(b, h2, w2, 1) * (w2 - 1)
        cy = RNG.rand(b, h2, w2, 1) * (h2 - 1)
        coords = jnp.asarray(np.concatenate([cx, cy], -1).astype(np.float32))

        chunks = lookup_corr_fused_chunks(corr0, coords, r, levels,
                                          dtype=jnp.float32)
        cin = levels * k2
        w = jnp.asarray(RNG.randn(cin, cout).astype(np.float32) * 0.1)
        bias = jnp.asarray(RNG.randn(cout).astype(np.float32))
        mod = ChunkFoldedConv1x1(features=cout, corr_levels=levels,
                                 corr_radius=r)
        variables = {"params": {"kernel": w.reshape(1, 1, cin, cout),
                                "bias": bias}}
        want = np.asarray(mod.apply(variables, chunks))  # (B, Q, cout)

        # stage-1 by hand (the kernel consumes t, not corr0)
        d = jnp.linspace(-r, r, 2 * r + 1, dtype=jnp.float32)
        sizes = _pool_sizes(h2, w2, levels)
        cxq = coords[..., 0].reshape(b, q)
        cyq = coords[..., 1].reshape(b, q)
        sx_all = jnp.concatenate(
            [_block_tent_weights_base(cxq / (2.0 ** l), d, l, w2, wl)
             for l, (_, wl) in enumerate(sizes)], axis=-2)
        t = jnp.einsum("bqyx,bqix->bqyi", corr0, sx_all)

        kk = 2 * r + 1
        idx = np.array([l * k2 + i * kk + j for l in range(levels)
                        for j in range(kk) for i in range(kk)])
        wp = jnp.asarray(np.asarray(w)[idx])

        saved = stage2._INTERPRET
        stage2._INTERPRET = True
        try:
            got = np.asarray(stage2.stage2_fold(
                t, cyq, wp, bias, r, [hl for hl, _ in sizes],
                dtype=jnp.float32,
                transpose_in_kernel=transpose_in_kernel))
        finally:
            stage2._INTERPRET = saved
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


class TestFullFold:
    """FF_STAGE2_FULLFOLD (BENCH.md Finding 12, measured NEGATIVE, kept
    opt-in): full (B,Q,LK,LK) stage-2 product + zero-expanded
    block-diagonal fold == the production per-level chunk path."""

    def test_matches_chunk_path(self, monkeypatch):
        from focusflow_official_tpu.kernels import fold
        from focusflow_official_tpu.nn.update import ChunkFoldedConv1x1
        from focusflow_official_tpu.ops.corr import lookup_corr_fused_chunks

        b, h2, w2, r, levels, cout = 1, 15, 26, 3, 3, 64
        k2 = (2 * r + 1) ** 2
        q = h2 * w2
        corr0 = jnp.asarray(RNG.randn(b, q, h2, w2).astype(np.float32))
        cx = RNG.rand(b, h2, w2, 1) * (w2 - 1)
        cy = RNG.rand(b, h2, w2, 1) * (h2 - 1)
        coords = jnp.asarray(np.concatenate([cx, cy], -1).astype(np.float32))

        cin = levels * k2
        w = jnp.asarray(RNG.randn(cin, cout).astype(np.float32) * 0.1)
        bias = jnp.asarray(RNG.randn(cout).astype(np.float32))
        mod = ChunkFoldedConv1x1(features=cout, corr_levels=levels,
                                 corr_radius=r)
        variables = {"params": {"kernel": w.reshape(1, 1, cin, cout),
                                "bias": bias}}

        monkeypatch.delenv("FF_STAGE2_FULLFOLD", raising=False)
        chunks = lookup_corr_fused_chunks(corr0, coords, r, levels,
                                          dtype=jnp.float32)
        want = np.asarray(mod.apply(variables, chunks))

        monkeypatch.setenv("FF_STAGE2_FULLFOLD", "1")
        full = lookup_corr_fused_chunks(corr0, coords, r, levels,
                                        dtype=jnp.float32)
        assert isinstance(full, tuple) and full[0] == "full36"
        # marker_ok=False callers (alternate_corr chunks) keep plain tuples
        plain = lookup_corr_fused_chunks(corr0, coords, r, levels,
                                         dtype=jnp.float32, marker_ok=False)
        assert not isinstance(plain[0], str)

        got = np.asarray(mod.apply(variables, full))  # XLA fallback on CPU
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

        saved = fold._INTERPRET
        fold._INTERPRET = True  # Mosaic kernel consumer, interpret mode
        try:
            got_k = np.asarray(mod.apply(variables, full))
        finally:
            fold._INTERPRET = saved
        np.testing.assert_allclose(got_k, want, atol=1e-4, rtol=1e-4)
