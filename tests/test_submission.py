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
