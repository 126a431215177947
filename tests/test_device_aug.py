"""On-device augmentation vs the CPU reference recipe.

The device augmentor (`data/device_aug.py`) is distribution-equivalent to
`data/augment.py::FlowAugmentor` (itself parity-tested against the
reference `core/utils/augmentor.py`); these tests pin the pieces that CAN
be exact — the separable warp vs cv2.resize->flip->crop, the photometric
blend formulas vs PIL (to uint8 rounding), eraser geometry — plus
end-to-end shape/validity under jit with mixed source sizes.
"""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest
from PIL import Image, ImageEnhance

from focusflow_official_tpu.data.device_aug import (
    DeviceFlowAugmentor, adjust_brightness, adjust_contrast, adjust_hue,
    adjust_saturation, warp_resize_crop, _rgb_to_gray,
)


def _img(h=96, w=128, c=3, seed=0):
    return (np.random.RandomState(seed).rand(h, w, c) * 255).astype(np.float32)


class TestWarp:
    @pytest.mark.parametrize("sy,sx,fv,fh", [
        (1.0, 1.0, False, False),
        (1.37, 1.12, False, False),
        (0.93, 1.55, True, False),
        (1.21, 1.21, True, True),
    ])
    def test_matches_cv2_resize_flip_crop(self, sy, sx, fv, fh):
        img = _img()
        h, w = img.shape[:2]
        hs, ws = int(round(h * sy)), int(round(w * sx))
        ch, cw = 64, 96
        y0, x0 = 5, 7
        ref = cv2.resize(img, (ws, hs), interpolation=cv2.INTER_LINEAR)
        if fh:
            ref = ref[:, ::-1]
        if fv:
            ref = ref[::-1]
        ref = ref[y0:y0 + ch, x0:x0 + cw]

        got = warp_resize_crop(
            jnp.asarray(img), jnp.float32(sy), jnp.float32(sx),
            jnp.int32(y0), jnp.int32(x0), jnp.asarray(fv), jnp.asarray(fh),
            (jnp.int32(h), jnp.int32(w)), (jnp.int32(hs), jnp.int32(ws)),
            (ch, cw))
        # cv2 INTER_LINEAR uses 11-bit fixed-point weights; allow that noise
        np.testing.assert_allclose(np.asarray(got), ref, atol=0.35)

    def test_padded_source_ignores_padding(self):
        img = _img(96, 128)
        pad = np.zeros((120, 160, 3), np.float32)
        pad[:96, :128] = img
        args = (jnp.float32(1.0), jnp.float32(1.0), jnp.int32(3),
                jnp.int32(4), jnp.asarray(False), jnp.asarray(False))
        a = warp_resize_crop(jnp.asarray(img), *args,
                             (jnp.int32(96), jnp.int32(128)),
                             (jnp.int32(96), jnp.int32(128)), (64, 96))
        b = warp_resize_crop(jnp.asarray(pad), *args,
                             (jnp.int32(96), jnp.int32(128)),
                             (jnp.int32(96), jnp.int32(128)), (64, 96))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestPhotometric:
    def test_brightness_contrast_saturation_match_pil(self):
        img = _img(48, 64).astype(np.uint8)
        pil = Image.fromarray(img)
        ext = jnp.ones((48, 64, 1), jnp.float32)
        for f in (0.62, 1.0, 1.31):
            want = np.asarray(ImageEnhance.Brightness(pil).enhance(f), np.float32)
            got = np.asarray(adjust_brightness(jnp.asarray(img, jnp.float32), f))
            assert np.abs(got - want).max() <= 1.0, "brightness"

            want = np.asarray(ImageEnhance.Color(pil).enhance(f), np.float32)
            got = np.asarray(adjust_saturation(jnp.asarray(img, jnp.float32), f))
            assert np.abs(got - want).max() <= 2.0, "saturation"

            want = np.asarray(ImageEnhance.Contrast(pil).enhance(f), np.float32)
            gray_mean = jnp.sum(_rgb_to_gray(jnp.asarray(img, jnp.float32))) / (48 * 64)
            got = np.asarray(adjust_contrast(jnp.asarray(img, jnp.float32), f,
                                             gray_mean))
            # PIL rounds the mean to an int first: allow 2/255
            assert np.abs(got - want).max() <= 2.0, "contrast"

    def test_hue_identity_and_gray_invariance(self):
        img = jnp.asarray(_img(32, 32))
        np.testing.assert_allclose(np.asarray(adjust_hue(img, 0.0)),
                                   np.asarray(img), atol=1e-3)
        gray = jnp.broadcast_to(img[..., :1], img.shape)
        np.testing.assert_allclose(np.asarray(adjust_hue(gray, 0.37)),
                                   np.asarray(gray), atol=1e-3)

    def test_hue_matches_colorsys(self):
        import colorsys

        rng = np.random.RandomState(5)
        px = rng.rand(20, 3).astype(np.float32)
        shift = 0.21
        got = np.asarray(adjust_hue(jnp.asarray(px[None] * 255), shift))[0] / 255
        for i in range(20):
            h, s, v = colorsys.rgb_to_hsv(*px[i])
            want = colorsys.hsv_to_rgb((h + shift) % 1.0, s, v)
            np.testing.assert_allclose(got[i], want, atol=1e-3)


class TestEndToEnd:
    def _batch(self, b=2, h=96, w=128):
        rng = np.random.RandomState(1)
        return {
            "image1": jnp.asarray(rng.rand(b, h, w, 3) * 255, jnp.float32),
            "image2": jnp.asarray(rng.rand(b, h, w, 3) * 255, jnp.float32),
            "flow": jnp.asarray(rng.randn(b, h, w, 2) * 3, jnp.float32),
            "mask1": jnp.asarray((rng.rand(b, h, w, 1) > 0.95) * 255, jnp.float32),
            "mask2": jnp.asarray(np.full((b, h, w, 1), 255), jnp.float32),
        }

    def test_shapes_ranges_and_one_compile(self):
        aug = DeviceFlowAugmentor((64, 96), min_scale=-0.1, max_scale=0.4)
        f = jax.jit(aug.__call__)
        out = f(jax.random.PRNGKey(0), self._batch())
        for k in ("image1", "image2"):
            assert out[k].shape == (2, 64, 96, 3)
            assert 0 <= float(out[k].min()) and float(out[k].max()) <= 255
        assert out["flow"].shape == (2, 64, 96, 2)
        assert out["valid"].shape == (2, 64, 96)
        assert float(out["valid"].mean()) == 1.0
        # second call with new key: no retrace needed (same shapes)
        out2 = f(jax.random.PRNGKey(1), self._batch())
        assert not np.allclose(np.asarray(out["image1"]), np.asarray(out2["image1"]))

    def test_mixed_source_sizes_one_compile(self):
        aug = DeviceFlowAugmentor((64, 96))
        batch = self._batch(b=2, h=120, w=160)
        # sample 1 is really 96x128, zero-padded to 120x160
        for k in batch:
            arr = np.array(batch[k])
            arr[1, 96:] = 0
            arr[1, :, 128:] = 0
            batch[k] = jnp.asarray(arr)
        batch["sizes"] = jnp.asarray([[120, 160], [96, 128]], jnp.int32)
        out = jax.jit(aug.__call__)(jax.random.PRNGKey(3), batch)
        assert out["image1"].shape == (2, 64, 96, 3)
        # the padded sample's crop must never contain padding zeros in both
        # frames simultaneously (prob of a true all-zero pixel ~ 0)
        assert float(out["image1"][1].mean()) > 20.0

    def test_flow_statistics_track_cpu_augmentor(self):
        """Flip/scale handling sanity: a constant (+dx, +dy) flow keeps
        |flow| distribution consistent with the scale range after aug."""
        aug = DeviceFlowAugmentor((64, 96), min_scale=0.0, max_scale=0.0,
                                  do_flip=True)
        b = 64
        batch = {
            "image1": jnp.ones((b, 96, 128, 3), jnp.float32) * 128,
            "image2": jnp.ones((b, 96, 128, 3), jnp.float32) * 128,
            "flow": jnp.broadcast_to(jnp.asarray([3.0, -2.0]), (b, 96, 128, 2)),
            "mask1": jnp.zeros((b, 96, 128, 1), jnp.float32),
            "mask2": jnp.zeros((b, 96, 128, 1), jnp.float32),
        }
        out = jax.jit(aug.__call__)(jax.random.PRNGKey(7), batch)
        fx = np.asarray(out["flow"][..., 0]).reshape(b, -1)
        fy = np.asarray(out["flow"][..., 1]).reshape(b, -1)
        # per-sample flow is +-scaled constant; scale in [2^0 / stretch range]
        assert np.all(np.abs(np.abs(fx).mean(1) - 3.0) < 3.0 * 0.16 + 0.3)
        assert np.all(np.abs(np.abs(fy).mean(1) - 2.0) < 2.0 * 0.16 + 0.3)
        frac_neg = (fx.mean(1) < 0).mean()
        assert 0.2 < frac_neg < 0.8  # h-flips at ~0.5


def _np_sparse_ref(flow, valid, fx, fy, do_spatial, fh, y0, x0, crop):
    """Faithful numpy port of the reference sparse spatial transform
    (`augmentor.py::resize_sparse_flow_map` + flip + crop, 203-256)."""
    flow = flow.copy()
    valid = valid.copy()
    if do_spatial:
        ht, wd = flow.shape[:2]
        coords = np.stack(np.meshgrid(np.arange(wd), np.arange(ht)),
                          axis=-1).reshape(-1, 2).astype(np.float32)
        flow_flat = flow.reshape(-1, 2)
        valid_flat = valid.reshape(-1)
        coords0 = coords[valid_flat >= 1]
        flow0 = flow_flat[valid_flat >= 1]
        ht1 = int(round(ht * fy))
        wd1 = int(round(wd * fx))
        coords1 = coords0 * [fx, fy]
        flow1 = flow0 * [fx, fy]
        xx = np.round(coords1[:, 0]).astype(np.int32)
        yy = np.round(coords1[:, 1]).astype(np.int32)
        v = (xx > 0) & (xx < wd1) & (yy > 0) & (yy < ht1)
        fimg = np.zeros([ht1, wd1, 2], np.float32)
        vimg = np.zeros([ht1, wd1], np.int32)
        cimg = np.zeros([ht1, wd1], np.int32)
        fimg[yy[v], xx[v]] = flow1[v]
        vimg[yy[v], xx[v]] = 1
        np.add.at(cimg, (yy[v], xx[v]), 1)
        flow, valid, count = fimg, vimg, cimg
    else:
        count = (valid >= 1).astype(np.int32)
    if fh:
        flow = flow[:, ::-1] * [-1.0, 1.0]
        valid = valid[:, ::-1]
        count = count[:, ::-1]
    sl = np.s_[y0:y0 + crop[0], x0:x0 + crop[1]]
    return flow[sl], valid[sl], count[sl]


class TestSparseScatter:
    def _problem(self, h=60, w=80, density=0.2, seed=3):
        rng = np.random.RandomState(seed)
        flow = rng.randn(h, w, 2).astype(np.float32) * 5
        valid = (rng.rand(h, w) < density).astype(np.float32)
        return flow, valid

    def _run_device(self, flow, valid, scale, do_spatial, fh, y0, x0, crop):
        from focusflow_official_tpu.data.device_aug import sparse_scatter_crop

        h, w = flow.shape[:2]
        s = scale if do_spatial else 1.0
        hs = int(round(h * s))
        ws = int(round(w * s))
        out_f, out_v = sparse_scatter_crop(
            jnp.asarray(flow), jnp.asarray(valid),
            jnp.float32(s), jnp.float32(s),
            jnp.int32(y0), jnp.int32(x0), jnp.asarray(fh),
            jnp.asarray([h, w], jnp.int32),
            (jnp.int32(hs), jnp.int32(ws)), crop,
            strict=jnp.asarray(do_spatial))
        return np.asarray(out_f), np.asarray(out_v)

    @pytest.mark.parametrize("scale,fh", [(1.25, False), (1.25, True),
                                          (2.0, False)])
    def test_upscale_exact(self, scale, fh):
        """Collision-free (injective) upscale: exact match vs the numpy
        reference, incl. the strict (index>0) boundary quirk and h-flip.
        Scale is an exact binary fraction so f32/f64 rounding agree."""
        flow, valid = self._problem()
        crop = (48, 64)
        y0, x0 = 5, 7
        want_f, want_v, cnt = _np_sparse_ref(
            flow, valid, scale, scale, True, fh, y0, x0, crop)
        assert cnt.max() <= 1  # injective: averaging == last-write
        got_f, got_v = self._run_device(flow, valid, scale, True, fh, y0, x0, crop)
        # reference flow values scale by [fx, fy]
        np.testing.assert_array_equal(got_v, want_v.astype(np.float32))
        np.testing.assert_allclose(got_f, want_f, atol=1e-5)

    def test_downscale_collisions_average(self):
        """Downscale: valid sets identical; flow exact where exactly one
        source landed, and within the colliding sources' range elsewhere
        (the reference keeps an arbitrary raster-order last write)."""
        flow, valid = self._problem(density=0.5)
        scale = 0.75
        crop = (32, 48)
        y0, x0 = 2, 3
        want_f, want_v, cnt = _np_sparse_ref(
            flow, valid, scale, scale, True, False, y0, x0, crop)
        got_f, got_v = self._run_device(flow, valid, scale, True, False, y0, x0, crop)
        np.testing.assert_array_equal(got_v, want_v.astype(np.float32))
        single = cnt == 1
        np.testing.assert_allclose(got_f[single], want_f[single], atol=1e-5)
        assert (cnt > 1).any()  # the case actually exercises collisions

    def test_no_spatial_identity_flip_crop(self):
        """do_spatial=False path: no scatter, no strict-bounds quirk —
        plain flip+crop of the raw sparse map."""
        flow, valid = self._problem()
        crop = (48, 64)
        want_f, want_v, _ = _np_sparse_ref(
            flow, valid, 1.0, 1.0, False, True, 4, 6, crop)
        got_f, got_v = self._run_device(flow, valid, 1.0, False, True, 4, 6, crop)
        np.testing.assert_array_equal(got_v, (want_v >= 1).astype(np.float32))
        # the reference keeps garbage flow at invalid pixels (the loss masks
        # them); the scatter zeroes them — compare the valid set, check zeros
        on = want_v >= 1
        np.testing.assert_allclose(got_f[on], want_f[on], atol=1e-5)
        assert np.abs(got_f[~on]).max() == 0.0


class TestRecipeDispatch:
    def test_mixed_dense_sparse_batch(self):
        """One jit'd call, recipe=[dense, sparse]: the dense sample keeps
        full valid, the sparse sample's valid stays sparse, shapes land at
        the crop for both."""
        from focusflow_official_tpu.data.device_aug import (
            dense_recipe, sparse_recipe)

        b, h, w = 2, 96, 128
        rng = np.random.RandomState(11)
        valid = np.ones((b, h, w), np.float32)
        valid[1] = (rng.rand(h, w) < 0.2)
        batch = {
            "image1": jnp.asarray(rng.rand(b, h, w, 3) * 255, jnp.float32),
            "image2": jnp.asarray(rng.rand(b, h, w, 3) * 255, jnp.float32),
            "flow": jnp.asarray(rng.randn(b, h, w, 2) * 3, jnp.float32),
            "valid": jnp.asarray(valid),
            "mask1": jnp.asarray((rng.rand(b, h, w, 1) > 0.95) * 255, jnp.float32),
            "mask2": jnp.asarray((rng.rand(b, h, w, 1) > 0.95) * 255, jnp.float32),
            "recipe": jnp.asarray([0, 1], jnp.int32),
        }
        aug = DeviceFlowAugmentor(
            (64, 96), recipes=[dense_recipe(-0.1, 0.4, do_flip=True),
                               sparse_recipe(-0.1, 0.4, do_flip=True)])
        out = jax.jit(aug.__call__)(jax.random.PRNGKey(5), batch)
        assert out["flow"].shape == (b, 64, 96, 2)
        assert out["valid"].shape == (b, 64, 96)
        assert float(out["valid"][0].mean()) == 1.0          # dense
        assert 0.0 < float(out["valid"][1].mean()) < 0.6     # stays sparse
        assert "recipe" not in out and "sizes" not in out
        # sparse flow is zero off the scattered points
        off = np.asarray(out["valid"][1]) < 0.5
        assert np.abs(np.asarray(out["flow"][1])[off]).max() == 0.0


def test_loader_collation_pads_mixed_resolutions_and_tags():
    """Mixed-stage raw batches: the loader zero-pads to the batch max and
    ships per-sample sizes + recipe ids (`data/loader.py::_collate`)."""
    from focusflow_official_tpu.data.loader import Loader

    def sample(h, w, rid):
        return {
            "image1": np.ones((h, w, 3), np.float32),
            "image2": np.ones((h, w, 3), np.float32),
            "flow": np.ones((h, w, 2), np.float32),
            "mask1": np.ones((h, w, 1), np.float32),
            "mask2": np.ones((h, w, 1), np.float32),
            "valid": np.ones((h, w), np.float32),
            "recipe": np.int32(rid),
        }

    loader = Loader([], batch_size=2)
    batch = loader._collate([sample(60, 100, 0), sample(80, 90, 1)])
    assert batch["image1"].shape == (2, 80, 100, 3)
    assert batch["valid"].shape == (2, 80, 100)
    np.testing.assert_array_equal(batch["sizes"], [[60, 100], [80, 90]])
    np.testing.assert_array_equal(batch["recipe"], [0, 1])
    # zero padding outside each sample's true extent
    assert batch["image1"][0, 60:].max() == 0.0
    assert batch["image1"][1, :, 90:].max() == 0.0
