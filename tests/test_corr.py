"""Parity test: correlation pyramid + windowed lookup vs the reference CorrBlock."""

import numpy as np
import torch

import jax.numpy as jnp

from conftest import requires_reference
from focusflow_official_tpu.ops import all_pairs_corr, corr_pyramid, lookup_corr_pyramid

RNG = np.random.RandomState(7)


@requires_reference
def test_corr_block_parity(ref_ffraft_modules):
    import FF_RAFT_Core.corr as ref_corr

    b, h, w, c = 2, 16, 24, 16
    f1 = RNG.randn(b, c, h, w).astype(np.float32)
    f2 = RNG.randn(b, c, h, w).astype(np.float32)
    coords = (RNG.rand(b, 2, h, w).astype(np.float32) * np.array([w, h], np.float32)[None, :, None, None])

    block = ref_corr.CorrBlock(torch.from_numpy(f1), torch.from_numpy(f2), num_levels=4, radius=4)
    want = block(torch.from_numpy(coords)).numpy()  # (B, 4*81, H, W)

    f1_nhwc = jnp.asarray(np.transpose(f1, (0, 2, 3, 1)))
    f2_nhwc = jnp.asarray(np.transpose(f2, (0, 2, 3, 1)))
    pyr = corr_pyramid(all_pairs_corr(f1_nhwc, f2_nhwc), num_levels=4, radius=4)
    got = lookup_corr_pyramid(pyr, jnp.asarray(np.transpose(coords, (0, 2, 3, 1))), impl="xla")
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))

    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pyramid_shapes():
    f = jnp.asarray(RNG.randn(1, 8, 10, 4).astype(np.float32))
    pyr = corr_pyramid(all_pairs_corr(f, f), num_levels=4, radius=4)
    assert [lvl.shape for lvl in pyr.levels] == [
        (1, 80, 8, 10), (1, 80, 4, 5), (1, 80, 2, 2), (1, 80, 1, 1)]


def _toy_problem(h=13, w=20, c=8, seed=3, spread=4.0):
    """Odd sizes on purpose: floor pooling drops trailing rows/cols at every
    level, which the fused block-tent weights must reproduce exactly."""
    rng = np.random.RandomState(seed)
    f1 = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = np.stack([gx, gy], -1)[None].astype(np.float32)
    coords = coords + rng.randn(1, h, w, 2).astype(np.float32) * spread
    coords[:, 0, 0] += 300.0  # fully out of range
    coords[:, -1, -1] -= 300.0
    return f1, f2, jnp.asarray(coords)


def _xla_reference(f1, f2, coords, radius=4):
    pyr = corr_pyramid(all_pairs_corr(f1, f2), num_levels=4, radius=radius)
    return np.asarray(lookup_corr_pyramid(pyr, coords, impl="xla"))


def test_mxu_lookup_matches_xla_at_f32():
    """The production tent-matmul formulation vs the gather reference, both
    f32: isolates formulation error from bf16 rounding (the model-level
    fast-path test can only bound the two together)."""
    from focusflow_official_tpu.ops.corr import _lookup_level_mxu, _lookup_level

    f1, f2, coords = _toy_problem(h=16, w=24, spread=6.0)
    levels = corr_pyramid(all_pairs_corr(f1, f2), 4, 4).levels
    for i, lvl in enumerate(levels):
        want = np.asarray(_lookup_level(lvl, coords / (2.0 ** i), 4))
        got = np.asarray(_lookup_level_mxu(lvl, coords / (2.0 ** i), 4,
                                           dtype=jnp.float32))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4,
                                   err_msg=f"level {i}")


class TestFusedLookup:
    """`lookup_corr_fused`: all levels from the level-0 volume, no pooling."""

    def test_matches_xla_gather(self):
        from focusflow_official_tpu.ops.corr import lookup_corr_fused

        f1, f2, coords = _toy_problem()
        want = _xla_reference(f1, f2, coords)
        got = np.asarray(lookup_corr_fused(
            all_pairs_corr(f1, f2), coords, 4, 4, dtype=jnp.float32))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    def test_chunks_match_fused_and_xla(self):
        """Chunked stage-2 (per-level diagonal dots, packed channel order)
        equals the monolithic fused form and the gather reference after the
        static packed->reference permutation — incl. out-of-range coords."""
        from focusflow_official_tpu.ops.corr import (
            lookup_corr_fused, lookup_corr_fused_chunks,
            packed_to_reference_perm,
        )

        f1, f2, coords = _toy_problem()
        b, h1, w1, _ = coords.shape
        corr0 = all_pairs_corr(f1, f2)
        want_fused = np.asarray(lookup_corr_fused(
            corr0, coords, 4, 4, dtype=jnp.float32))
        chunks = lookup_corr_fused_chunks(corr0, coords, 4, 4, dtype=jnp.float32)
        assert len(chunks) == 4 and all(c.shape[-2:] == (9, 9) for c in chunks)
        perm = np.asarray(packed_to_reference_perm(4, 4))
        # involution: the same permutation maps both directions
        assert np.array_equal(perm[perm], np.arange(perm.size))
        packed = jnp.concatenate(
            [c.reshape(b, h1, w1, 81) for c in chunks], axis=-1)
        got = np.asarray(packed)[..., perm]
        np.testing.assert_allclose(got, want_fused, atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(got, _xla_reference(f1, f2, coords),
                                   atol=2e-4, rtol=1e-4)

    def test_tent_base_matches_legacy_build(self):
        """`FF_TENT_BASE=1` (hoisted-base tent builds, the round-4 default)
        and `FF_TENT_BASE=0` (legacy per-level builds) are the same math —
        chunks must agree to float tolerance, incl. out-of-range coords."""
        import os

        from focusflow_official_tpu.ops.corr import lookup_corr_fused_chunks

        f1, f2, coords = _toy_problem()
        corr0 = all_pairs_corr(f1, f2)
        saved = os.environ.get("FF_TENT_BASE")
        try:
            os.environ["FF_TENT_BASE"] = "1"
            base = lookup_corr_fused_chunks(corr0, coords, 4, 4,
                                            dtype=jnp.float32)
            os.environ["FF_TENT_BASE"] = "0"
            legacy = lookup_corr_fused_chunks(corr0, coords, 4, 4,
                                              dtype=jnp.float32)
        finally:
            if saved is None:
                os.environ.pop("FF_TENT_BASE", None)
            else:
                os.environ["FF_TENT_BASE"] = saved
        for lvl, (g, w) in enumerate(zip(base, legacy)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=2e-5, rtol=1e-5,
                                       err_msg=f"level {lvl}")

    def test_stage2_pool_matches_default(self):
        """`FF_STAGE2_POOL=1` (pooled stage-2 y-contraction) must equal the
        default block-tent stage 2: the level-l block tent is constant within
        each 2^l pool block, so pooling t then contracting a plain tent is
        the same sum reassociated. Odd sizes exercise the floor-pool rows."""
        import os

        from focusflow_official_tpu.ops.corr import lookup_corr_fused_chunks

        f1, f2, coords = _toy_problem()
        corr0 = all_pairs_corr(f1, f2)
        want = lookup_corr_fused_chunks(corr0, coords, 4, 4, dtype=jnp.float32)
        saved = os.environ.get("FF_STAGE2_POOL")
        try:
            os.environ["FF_STAGE2_POOL"] = "1"
            got = lookup_corr_fused_chunks(corr0, coords, 4, 4,
                                           dtype=jnp.float32)
        finally:
            if saved is None:
                os.environ.pop("FF_STAGE2_POOL", None)
            else:
                os.environ["FF_STAGE2_POOL"] = saved
        for lvl, (g, w) in enumerate(zip(got, want)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=2e-5, rtol=1e-5,
                                       err_msg=f"level {lvl}")

    def test_q8_chunks_within_quantization_budget(self):
        """int8-volume lookup (`FF_CORR_Q8` path) matches the exact chunked
        form within its documented ~1%-of-row-max error budget."""
        from focusflow_official_tpu.ops.corr import (
            lookup_corr_fused_chunks, lookup_corr_fused_chunks_q8,
            quantize_corr_q8,
        )

        f1, f2, coords = _toy_problem()
        corr0 = all_pairs_corr(f1, f2)
        want = lookup_corr_fused_chunks(corr0, coords, 4, 4, dtype=jnp.float32)
        c_i8, scale = quantize_corr_q8(corr0)
        assert c_i8.dtype == jnp.int8 and scale.shape == corr0.shape[:2]
        got = lookup_corr_fused_chunks_q8(c_i8, scale, coords, 4, 4,
                                          dtype=jnp.float32)
        row_max = np.asarray(scale) * 127.0  # (B, Q) per-row |corr| max
        for lvl, (g, w) in enumerate(zip(got, want)):
            err = np.abs(np.asarray(g) - np.asarray(w))
            rel = err / (row_max[:, :, None, None] + 1e-12)
            assert rel.max() < 0.02, (lvl, rel.max())

    def test_q8_storage_chunks_tighter_than_full_q8(self):
        """int8-STORAGE lookup (`FF_CORR_Q8=1` production variant): only the
        volume is quantized, so error must stay within ~0.5% of row max —
        tighter than the full-int8 variant's 2% budget."""
        from focusflow_official_tpu.ops.corr import (
            lookup_corr_fused_chunks, lookup_corr_fused_chunks_q8s,
            quantize_corr_q8,
        )

        f1, f2, coords = _toy_problem()
        corr0 = all_pairs_corr(f1, f2)
        want = lookup_corr_fused_chunks(corr0, coords, 4, 4, dtype=jnp.float32)
        c_i8, scale = quantize_corr_q8(corr0)
        got = lookup_corr_fused_chunks_q8s(c_i8, scale, coords, 4, 4,
                                           dtype=jnp.float32)
        row_max = np.asarray(scale) * 127.0
        for lvl, (g, w) in enumerate(zip(got, want)):
            err = np.abs(np.asarray(g) - np.asarray(w))
            rel = err / (row_max[:, :, None, None] + 1e-12)
            assert rel.max() < 0.005, (lvl, rel.max())

    def test_packed_matches_fused_and_xla(self):
        """The VPU-stage-2 packed form equals the monolithic fused form and
        the gather reference after the static packed->reference permutation."""
        from focusflow_official_tpu.ops.corr import (
            lookup_corr_fused, lookup_corr_fused_packed,
            packed_to_reference_perm,
        )

        f1, f2, coords = _toy_problem()
        b, h1, w1, _ = coords.shape
        corr0 = all_pairs_corr(f1, f2)
        want_fused = np.asarray(lookup_corr_fused(
            corr0, coords, 4, 4, dtype=jnp.float32))
        packed = lookup_corr_fused_packed(corr0, coords, 4, 4,
                                          dtype=jnp.float32)
        assert packed.shape == (b, h1 * w1, 4 * 81)
        perm = np.asarray(packed_to_reference_perm(4, 4))
        got = np.asarray(packed).reshape(b, h1, w1, -1)[..., perm]
        np.testing.assert_allclose(got, want_fused, atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(got, _xla_reference(f1, f2, coords),
                                   atol=2e-4, rtol=1e-4)

    def test_weight_fold_identity(self):
        """conv1x1(reference_order, W) == conv1x1(packed_order, W[perm]) —
        the identity the motion encoder's PermutedConv1x1 relies on."""
        from focusflow_official_tpu.ops.corr import packed_to_reference_perm

        rng = np.random.RandomState(11)
        perm = np.asarray(packed_to_reference_perm(4, 4))
        ref = rng.randn(2, 3, 4, 324).astype(np.float32)
        packed = ref[..., perm]  # involution: packed order from ref order
        w = rng.randn(324, 16).astype(np.float32)
        np.testing.assert_allclose(
            np.einsum("bhwc,co->bhwo", ref, w),
            np.einsum("bhwc,co->bhwo", packed, w[perm]),
            atol=1e-4, rtol=1e-5)

    def test_alternate_matches_materialized(self):
        """ALT_CORR path (chunked on-the-fly volume, `alternate_corr_lookup`)
        equals the materialized fused lookup and the gather reference —
        including a chunk size that does not divide Q (padding path)."""
        from focusflow_official_tpu.ops.corr import (
            alternate_corr_lookup, lookup_corr_fused_chunks,
        )

        f1, f2, coords = _toy_problem()
        b, h1, w1, _ = coords.shape
        corr0 = all_pairs_corr(f1, f2)
        want = lookup_corr_fused_chunks(corr0, coords, 4, 4, dtype=jnp.float32)
        for chunk in (h1 * w1, 48):  # one chunk; and a non-divisor
            got = alternate_corr_lookup(f1, f2, coords, 4, 4, chunk=chunk,
                                        dtype=jnp.float32)
            assert len(got) == 4
            for g, wnt in zip(got, want):
                assert g.shape == (b, h1 * w1, 9, 9)
                np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                           atol=2e-4, rtol=1e-4)

    def test_alternate_model_end_to_end(self):
        """FFRaft with alt_corr=True matches the materialized model exactly
        (same params, f32, xla vs alt path)."""
        import jax

        from focusflow_official_tpu.models import FFRaft, FFRaftConfig

        rng = np.random.RandomState(2)
        kw = dict(fusion="parallel", fusion_type="1x1conv", fuse_cnet=True,
                  iters=3, corr_impl="fused")
        img = lambda: jnp.asarray(rng.rand(1, 128, 160, 3) * 255, jnp.float32)
        msk = lambda v: jnp.asarray(
            (rng.rand(1, 128, 160, 1) > 0.99) * 255 if v is None else
            np.full((1, 128, 160, 1), 255.0), jnp.float32)
        i1, i2, m1, m2 = img(), img(), msk(None), msk(255)
        base = FFRaft(FFRaftConfig(**kw))
        alt = FFRaft(FFRaftConfig(**kw, alt_corr=True, alt_corr_chunk=128))
        v = base.init(jax.random.PRNGKey(0), i1, i2, m1, m2, iters=1)
        _, f_base = base.apply(v, i1, i2, m1, m2, test_mode=True)
        _, f_alt = alt.apply(v, i1, i2, m1, m2, test_mode=True)
        np.testing.assert_allclose(np.asarray(f_alt), np.asarray(f_base),
                                   atol=5e-3, rtol=1e-4)

    def test_auto_routes_fused_pyramid(self):
        f1, f2, coords = _toy_problem(h=16, w=16)
        want = _xla_reference(f1, f2, coords)
        pyr = corr_pyramid(all_pairs_corr(f1, f2), 4, 4, fused=True)
        assert len(pyr.levels) == 1
        got = np.asarray(lookup_corr_pyramid(pyr, coords, impl="auto",
                                             num_levels=4))
        # default fused dtype is bf16: loose bound
        np.testing.assert_allclose(got, want, atol=0.35, rtol=0.05)


class TestPallasLookup:
    """Pallas patch-extraction kernel (interpret mode on CPU)."""

    def test_matches_xla_gather(self):
        from focusflow_official_tpu.ops.pallas_lookup import (
            lookup_corr_pyramid_pallas,
        )

        f1, f2, coords = _toy_problem(h=16, w=24, spread=6.0)
        want = _xla_reference(f1, f2, coords)
        levels = corr_pyramid(all_pairs_corr(f1, f2), 4, 4).levels
        got = np.asarray(lookup_corr_pyramid_pallas(levels, coords, 4))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    def test_custom_vjp_grads_match_xla(self):
        import jax

        from focusflow_official_tpu.ops.pallas_lookup import (
            lookup_corr_pyramid_pallas,
        )

        f1, f2, coords = _toy_problem(h=8, w=16, c=4, spread=2.0)
        levels = corr_pyramid(all_pairs_corr(f1, f2), 4, 4).levels

        def loss_pallas(levels, coords):
            out = lookup_corr_pyramid_pallas(levels, coords, 4)
            return jnp.sum(jnp.sin(out * 0.1))

        def loss_xla(levels, coords):
            from focusflow_official_tpu.ops.corr import CorrPyramid

            pyr = CorrPyramid(levels=levels, radius=4)
            out = lookup_corr_pyramid(pyr, coords, impl="xla")
            return jnp.sum(jnp.sin(out * 0.1))

        gl_p, gc_p = jax.grad(loss_pallas, argnums=(0, 1))(tuple(levels), coords)
        gl_x, gc_x = jax.grad(loss_xla, argnums=(0, 1))(tuple(levels), coords)
        for a, b in zip(gl_p, gl_x):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-2, rtol=5e-2)
        np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc_x),
                                   atol=5e-2, rtol=5e-2)


class TestTentRowBuilds:
    """FF_TENT_ROWS / FF_TENT_ROWS_Y (BENCH.md Finding 13): the
    single-expression row-table tent builds are bit-exact vs the
    per-level concat-of-4 form (same per-row math, power-of-two scales)."""

    def _case(self):
        rng = np.random.RandomState(0)
        b, h2, w2 = 1, 15, 26
        q = h2 * w2
        corr0 = jnp.asarray(rng.randn(b, q, h2, w2).astype(np.float32))
        coords = jnp.asarray(
            (rng.rand(b, h2, w2, 2) * [[w2 - 1, h2 - 1]]).astype(np.float32))
        return corr0, coords

    def test_rows_match_concat_builds(self, monkeypatch):
        from focusflow_official_tpu.ops.corr import lookup_corr_fused_chunks

        corr0, coords = self._case()
        monkeypatch.setenv("FF_TENT_ROWS", "0")
        monkeypatch.setenv("FF_TENT_ROWS_Y", "0")
        want = lookup_corr_fused_chunks(corr0, coords, 4, 4, dtype=jnp.float32)
        monkeypatch.setenv("FF_TENT_ROWS", "1")
        monkeypatch.setenv("FF_TENT_ROWS_Y", "1")
        got = lookup_corr_fused_chunks(corr0, coords, 4, 4, dtype=jnp.float32)
        for a, b in zip(want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
