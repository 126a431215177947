"""E2E test for the KITTI submission writer on a synthetic testing layout."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from focusflow_official_tpu.data.datasets import KITTI
from focusflow_official_tpu.data.io import read_flow_kitti
from focusflow_official_tpu.models import FFRaft, FFRaftConfig
from focusflow_official_tpu.train.submission import create_kitti_submission


def _make_kitti_testing(root, mask_root, n=2, h=64, w=96):
    import cv2

    img_dir = os.path.join(root, "testing", "image_2")
    msk_dir = os.path.join(mask_root, "orb", "testing")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(msk_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        for suffix in ("10", "11"):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            cv2.imwrite(f"{img_dir}/{i:06d}_{suffix}.png", img)
            m = ((rng.rand(h, w) > 0.95) * 255).astype(np.uint8)
            cv2.imwrite(f"{msk_dir}/{i:06d}_{suffix}.png", m)


def test_kitti_submission(tmp_path):
    root = str(tmp_path / "KITTI")
    mask_root = str(tmp_path / "mask")
    _make_kitti_testing(root, mask_root)

    ds = KITTI(root, mask_root, split="testing", mask_type="orb")
    assert len(ds) == 2 and ds.is_test

    cfg = FFRaftConfig(fusion="parallel", fuse_cnet=True, compute_dtype="float32",
                       corr_impl="xla")
    model = FFRaft(cfg)
    s = ds[0]
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(s["image1"][None]), jnp.asarray(s["image2"][None]),
        jnp.asarray(s["mask1"][None]), jnp.asarray(s["mask2"][None]), iters=1,
    )

    out = str(tmp_path / "submission")
    create_kitti_submission(model, variables, ds, out, iters=2)

    files = sorted(os.listdir(out))
    assert files == ["000000_10.png", "000001_10.png"]
    flow, valid = read_flow_kitti(os.path.join(out, files[0]))
    assert flow.shape == (64, 96, 2) and valid.min() == 1
    assert np.isfinite(flow).all()


class _FakeSintelTest:
    """Duck-typed MpiSintel(split='testing'): 2 scenes x 3 frames."""

    def __init__(self, h=64, w=96):
        rng = np.random.RandomState(4)
        self._samples = []
        for scene in ("alley_1", "alley_2"):
            frames = [(rng.rand(h, w, 3) * 255).astype(np.float32)
                      for _ in range(3)]
            masks = [((rng.rand(h, w, 1) > 0.97) * 255).astype(np.float32)
                     for _ in range(3)]
            for i in range(2):
                self._samples.append({
                    "image1": frames[i], "image2": frames[i + 1],
                    "mask1": masks[i], "mask2": masks[i + 1],
                    "extra_info": (scene, i),
                })

    def __len__(self):
        return len(self._samples)

    def __getitem__(self, i):
        return self._samples[i]


def test_sintel_submission_warm_start(tmp_path):
    """Sintel writer e2e incl. the warm start (flow_prev resets per scene):
    writes frameNNNN.flo per scene/dstype, readable and finite."""
    from focusflow_official_tpu.data.io import read_flo
    from focusflow_official_tpu.models import FFRaft, FFRaftConfig
    from focusflow_official_tpu.train.submission import create_sintel_submission

    cfg = FFRaftConfig(fusion="parallel", fusion_type="1x1conv",
                       fuse_cnet=True, iters=2, compute_dtype="float32",
                       corr_impl="xla")
    model = FFRaft(cfg)
    ds = _FakeSintelTest()
    s = ds[0]
    variables = model.init(
        jax.random.PRNGKey(0), *[jnp.asarray(s[k][None]) for k in
                                 ("image1", "image2", "mask1", "mask2")],
        iters=1)
    out = str(tmp_path / "sintel_out")
    create_sintel_submission(model, variables, {"clean": ds}, out, iters=2,
                             warm_start=True)
    for scene in ("alley_1", "alley_2"):
        for fid in (1, 2):
            p = os.path.join(out, "clean", scene, f"frame{fid:04d}.flo")
            assert os.path.exists(p), p
            flow = read_flo(p)
            assert flow.shape == (64, 96, 2) and np.isfinite(flow).all()
