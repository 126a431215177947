"""Golden tests for the ops layer against torch reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from focusflow_official_tpu.ops import (
    InputPadder,
    avg_pool2x2,
    bilinear_sample,
    convex_upsample,
    coords_grid,
    local_corr,
    resize_bilinear,
    resize_bilinear_align_corners,
    upflow8,
)

RNG = np.random.RandomState(0)


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


class TestBilinearSample:
    def _torch_ref(self, img_nchw, coords_xy):
        """Reference bilinear_sampler (`core/utils/utils.py:57-71`) semantics."""
        img = torch.from_numpy(img_nchw)
        coords = torch.from_numpy(coords_xy)
        H, W = img.shape[-2:]
        xgrid, ygrid = coords.split([1, 1], dim=-1)
        xgrid = 2 * xgrid / (W - 1) - 1
        ygrid = 2 * ygrid / (H - 1) - 1
        grid = torch.cat([xgrid, ygrid], dim=-1)
        return F.grid_sample(img, grid, align_corners=True).numpy()

    def test_matches_grid_sample(self):
        img = RNG.randn(2, 3, 13, 17).astype(np.float32)
        # include in-bounds, boundary, and out-of-bounds samples
        coords = (RNG.rand(2, 9, 11, 2).astype(np.float32) * 24 - 4)
        want = self._torch_ref(img, coords)  # (B, C, 9, 11)

        got = bilinear_sample(jnp.asarray(to_nhwc(img)), jnp.asarray(coords))
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPool:
    @pytest.mark.parametrize("h,w", [(8, 8), (7, 9), (13, 5)])
    def test_avg_pool_floor(self, h, w):
        x = RNG.randn(3, 4, h, w).astype(np.float32)
        want = F.avg_pool2d(torch.from_numpy(x), 2, stride=2).numpy()
        got = np.asarray(avg_pool2x2(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestResize:
    @pytest.mark.parametrize("new_hw", [(16, 24), (9, 13), (64, 96)])
    def test_align_corners_true(self, new_hw):
        x = RNG.randn(2, 3, 8, 12).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x), size=new_hw, mode="bilinear",
                             align_corners=True).numpy()
        got = np.asarray(resize_bilinear_align_corners(jnp.asarray(to_nhwc(x)), new_hw))
        np.testing.assert_allclose(to_nchw(got), want, atol=1e-5)

    @pytest.mark.parametrize("new_hw", [(16, 24), (9, 13), (4, 6)])
    def test_align_corners_false(self, new_hw):
        x = RNG.randn(2, 3, 8, 12).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x), size=new_hw, mode="bilinear",
                             align_corners=False).numpy()
        got = np.asarray(resize_bilinear(jnp.asarray(to_nhwc(x)), new_hw))
        np.testing.assert_allclose(to_nchw(got), want, atol=1e-5)

    def test_upflow8(self):
        flow = RNG.randn(1, 2, 6, 8).astype(np.float32)
        want = 8 * F.interpolate(torch.from_numpy(flow), size=(48, 64), mode="bilinear",
                                 align_corners=True).numpy()
        got = np.asarray(upflow8(jnp.asarray(to_nhwc(flow))))
        np.testing.assert_allclose(to_nchw(got), want, atol=1e-4)


class TestConvexUpsample:
    def _torch_ref(self, flow, mask):
        """RAFT upsample_flow (`FF_RAFT_Core/raft.py:159-170`) semantics."""
        flow = torch.from_numpy(flow)
        mask = torch.from_numpy(mask)
        N, _, H, W = flow.shape
        mask = mask.view(N, 1, 9, 8, 8, H, W)
        mask = torch.softmax(mask, dim=2)
        up_flow = F.unfold(8 * flow, [3, 3], padding=1)
        up_flow = up_flow.view(N, 2, 9, 1, 1, H, W)
        up_flow = torch.sum(mask * up_flow, dim=2)
        up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
        return up_flow.reshape(N, 2, 8 * H, 8 * W).numpy()

    def test_matches_reference(self):
        flow = RNG.randn(2, 2, 5, 7).astype(np.float32)
        mask = RNG.randn(2, 64 * 9, 5, 7).astype(np.float32)
        want = self._torch_ref(flow, mask)
        got = np.asarray(
            convex_upsample(jnp.asarray(to_nhwc(flow)), jnp.asarray(to_nhwc(mask)))
        )
        np.testing.assert_allclose(to_nchw(got), want, atol=1e-4)


class TestPadder:
    @pytest.mark.parametrize("mode,h,w", [("sintel", 436, 1024), ("kitti", 375, 1242),
                                          ("sintel", 64, 96)])
    def test_pad_unpad(self, mode, h, w):
        x = RNG.randn(1, h, w, 3).astype(np.float32)
        padder = InputPadder(x.shape, mode=mode)
        padded = padder.pad(jnp.asarray(x))
        assert padded.shape[1] % 8 == 0 and padded.shape[2] % 8 == 0

        want = F.pad(
            torch.from_numpy(to_nchw(x)),
            padder._pad,
            mode="replicate",
        ).numpy()
        np.testing.assert_allclose(to_nchw(np.asarray(padded)), want, atol=0)
        back = padder.unpad(padded)
        np.testing.assert_allclose(np.asarray(back), x, atol=0)


class TestCoordsGrid:
    def test_xy_order(self):
        g = np.asarray(coords_grid(1, 3, 4))
        assert g.shape == (1, 3, 4, 2)
        np.testing.assert_array_equal(g[0, 1, 2], [2.0, 1.0])  # (x, y)


class TestLocalCorr:
    def test_naive_reference(self):
        """Check against a direct numpy loop of the CUDA kernel's math
        (`ff-pwcnet/PWCNet_Core/correlation.py:34-101`)."""
        b, h, w, c, r = 2, 6, 7, 5, 2
        f1 = RNG.randn(b, h, w, c).astype(np.float32)
        f2 = RNG.randn(b, h, w, c).astype(np.float32)
        k = 2 * r + 1
        want = np.zeros((b, h, w, k * k), np.float32)
        f2p = np.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                ch = (dy + r) * k + (dx + r)
                shifted = f2p[:, r + dy : r + dy + h, r + dx : r + dx + w]
                want[..., ch] = (f1 * shifted).mean(-1)
        got = np.asarray(local_corr(jnp.asarray(f1), jnp.asarray(f2), radius=r))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_differentiable(self):
        import jax

        f1 = jnp.asarray(RNG.randn(1, 4, 4, 3).astype(np.float32))
        f2 = jnp.asarray(RNG.randn(1, 4, 4, 3).astype(np.float32))
        g1, g2 = jax.grad(lambda a, b: local_corr(a, b, 1).sum(), argnums=(0, 1))(f1, f2)
        assert g1.shape == f1.shape and g2.shape == f2.shape
        assert np.isfinite(np.asarray(g1)).all()
