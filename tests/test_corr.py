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
