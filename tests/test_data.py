"""Data layer tests: codecs, augmentors, curriculum indexing, mask creators."""

import os

import numpy as np
import pytest

from focusflow_official_tpu.data import io as ffio
from focusflow_official_tpu.data.augment import ColorJitter, FlowAugmentor, SparseFlowAugmentor
from focusflow_official_tpu.data.datasets import WeightedConcat
from focusflow_official_tpu.data.masks import good_feature_mask, orb_mask, sift_mask, silk_from_scores
from focusflow_official_tpu.data.flow_viz import flow_to_image, make_colorwheel

RNG = np.random.RandomState(11)


class TestCodecs:
    def test_flo_roundtrip(self, tmp_path):
        flow = RNG.randn(17, 23, 2).astype(np.float32)
        p = str(tmp_path / "a.flo")
        ffio.write_flo(p, flow)
        back = ffio.read_flo(p)
        np.testing.assert_array_equal(back, flow)

    def test_flo_matches_reference_reader(self, tmp_path):
        """Byte-compatibility with the reference .flo format (magic 202021.25)."""
        flow = RNG.randn(5, 7, 2).astype(np.float32)
        p = str(tmp_path / "b.flo")
        ffio.write_flo(p, flow)
        with open(p, "rb") as f:
            magic = np.fromfile(f, np.float32, 1)[0]
            w = np.fromfile(f, np.int32, 1)[0]
            h = np.fromfile(f, np.int32, 1)[0]
        assert magic == np.float32(202021.25) and (w, h) == (7, 5)

    def test_kitti_roundtrip(self, tmp_path):
        flow = (RNG.randn(11, 13, 2) * 30).astype(np.float32)
        p = str(tmp_path / "k.png")
        ffio.write_flow_kitti(p, flow)
        back, valid = ffio.read_flow_kitti(p)
        assert valid.min() == 1
        np.testing.assert_allclose(back, flow, atol=1 / 64.0 + 1e-6)

    def test_pfm_read(self, tmp_path):
        """Write a little-endian PFM by hand, check flip + shape."""
        h, w = 6, 4
        data = RNG.rand(h, w, 3).astype("<f4")
        p = tmp_path / "f.pfm"
        with open(p, "wb") as f:
            f.write(b"PF\n")
            f.write(f"{w} {h}\n".encode())
            f.write(b"-1.0\n")
            np.flipud(data).astype("<f4").tofile(f)
        got = ffio.read_pfm(str(p))
        np.testing.assert_allclose(got, data, atol=1e-7)


class TestAugment:
    def _sample(self, h=120, w=160):
        img1 = (RNG.rand(h, w, 3) * 255).astype(np.uint8)
        img2 = (RNG.rand(h, w, 3) * 255).astype(np.uint8)
        flow = RNG.randn(h, w, 2).astype(np.float32)
        mask1 = ((RNG.rand(h, w, 1) > 0.95) * 255).astype(np.uint8)
        mask2 = ((RNG.rand(h, w, 1) > 0.95) * 255).astype(np.uint8)
        return img1, img2, flow, mask1, mask2

    def test_dense_augmentor_shapes(self):
        aug = FlowAugmentor(crop_size=(64, 96), seed=0)
        for _ in range(5):
            img1, img2, flow, m1, m2 = aug(*self._sample())
            assert img1.shape == (64, 96, 3) and img2.shape == (64, 96, 3)
            assert flow.shape == (64, 96, 2)
            assert m1.shape == (64, 96, 1) and m2.shape == (64, 96, 1)

    def test_sparse_augmentor_shapes(self):
        aug = SparseFlowAugmentor(crop_size=(64, 96), do_flip=True, seed=0)
        img1, img2, flow, m1, m2 = self._sample()
        valid = (RNG.rand(*flow.shape[:2]) > 0.5).astype(np.float32)
        i1, i2, fl, v, a, b = aug(img1, img2, flow, valid, m1, m2)
        assert fl.shape == (64, 96, 2) and v.shape == (64, 96)
        assert a.shape == (64, 96, 1)

    def test_color_jitter_changes_image(self):
        img = (RNG.rand(32, 32, 3) * 255).astype(np.uint8)
        cj = ColorJitter(0.4, 0.4, 0.4, 0.1, rng=np.random.RandomState(0))
        out = cj(img)
        assert out.shape == img.shape and out.dtype == np.uint8
        assert not np.array_equal(out, img)

    def test_hflip_negates_u(self):
        aug = FlowAugmentor(crop_size=(100, 140), seed=0)
        aug.spatial_aug_prob = 0.0
        aug.h_flip_prob = 1.0
        aug.v_flip_prob = 0.0
        img1, img2, flow, m1, m2 = self._sample(100, 140)
        _, _, fl, _, _ = aug.spatial_transform(img1, img2, flow, m1, m2)
        np.testing.assert_allclose(fl[:, :, 0], -flow[:, ::-1, 0])
        np.testing.assert_allclose(fl[:, :, 1], flow[:, ::-1, 1])


class _FakeDS:
    def __init__(self, tag, n):
        self.tag, self.n = tag, n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (self.tag, i % self.n)


class TestWeightedConcat:
    def test_curriculum_weighting(self):
        a, b = _FakeDS("a", 3), _FakeDS("b", 5)
        ds = WeightedConcat([(a, 100), (b, 1)])
        assert len(ds) == 305
        # the first 300 indices hit a (cycled), last 5 hit b
        assert ds[0] == ("a", 0) and ds[299] == ("a", 299 % 3)
        assert ds[300] == ("b", 0) and ds[304] == ("b", 4)


class TestMasks:
    def _img(self):
        # textured random image so all detectors (incl. ORB's FAST at
        # patchSize 31) find keypoints
        rng = np.random.RandomState(0)
        img = (rng.rand(160, 200, 3) * 255).astype(np.uint8)
        img[40:120, 40:120] = 255
        return img

    @pytest.mark.parametrize("fn", [good_feature_mask, sift_mask, orb_mask])
    def test_creators(self, fn):
        mask = fn(self._img())
        assert mask.shape == (160, 200) and mask.dtype == np.uint8
        assert set(np.unique(mask)).issubset({0, 255})
        assert (mask == 255).sum() > 0

    def test_silk_from_scores(self):
        scores = RNG.rand(40, 50).astype(np.float32)
        mask = silk_from_scores(scores, top_k=100)
        assert (mask == 255).sum() == 100


def test_flow_viz():
    wheel = make_colorwheel()
    assert wheel.shape == (55, 3)
    img = flow_to_image(RNG.randn(16, 16, 2).astype(np.float32))
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
