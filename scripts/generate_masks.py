#!/usr/bin/env python
"""Offline keypoint-mask generation for all datasets.

Equivalent of `/root/reference/scripts/maskGenerate.py:88-318`: walks each
dataset's directory layout and writes a mirrored mask tree under
`<mask_root>/<mask_type>/...`, one 0/255 PNG per frame. Detectors live in
`focusflow_official_tpu/data/masks.py` (gf / sift / orb; SiLK masks are
ingested from precomputed score maps via `silk_from_scores`).

Usage:
  python scripts/generate_masks.py --dataset chairs --data-root data/FlyingChairs_release \
      --mask-root data/mask/FlyingChairs_release --mask-type orb
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
from glob import glob

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from focusflow_official_tpu.data.io import read_image
from focusflow_official_tpu.data.masks import MASK_CREATORS


def _save_mask(mask: np.ndarray, out_path: str) -> None:
    import cv2

    os.makedirs(osp.dirname(out_path), exist_ok=True)
    cv2.imwrite(out_path, mask)


def _process(image_paths, out_paths, creator, verbose_every=200):
    for i, (src, dst) in enumerate(zip(image_paths, out_paths)):
        if osp.exists(dst):
            continue
        img = read_image(src)
        _save_mask(creator(img), dst)
        if i % verbose_every == 0:
            print(f"  {i}/{len(image_paths)}", flush=True)


def generate_chairs(data_root, mask_root, mask_type):
    creator = MASK_CREATORS[mask_type]
    images = sorted(glob(osp.join(data_root, "data/*.ppm")))
    outs = [osp.join(mask_root, mask_type, osp.splitext(osp.basename(p))[0] + ".png")
            for p in images]
    _process(images, outs, creator)


def generate_things(data_root, mask_root, mask_type):
    creator = MASK_CREATORS[mask_type]
    for dstype in ("frames_cleanpass", "frames_finalpass"):
        for split in ("TRAIN", "TEST"):
            images = sorted(glob(osp.join(data_root, dstype, split, "*/*/left/*.png")))
            outs = [osp.join(mask_root, mask_type,
                             osp.relpath(p, data_root)) for p in images]
            _process(images, outs, creator)


def generate_sintel(data_root, mask_root, mask_type):
    creator = MASK_CREATORS[mask_type]
    for split in ("training", "val", "test"):
        for dstype in ("clean", "final"):
            images = sorted(glob(osp.join(data_root, split, dstype, "*/*.png")))
            outs = [osp.join(mask_root, mask_type,
                             osp.relpath(p, data_root)) for p in images]
            _process(images, outs, creator)


def generate_kitti(data_root, mask_root, mask_type):
    creator = MASK_CREATORS[mask_type]
    for split in ("training", "val", "testing"):
        images = sorted(glob(osp.join(data_root, split, "image_2/*.png")))
        outs = [osp.join(mask_root, mask_type, split, osp.basename(p)) for p in images]
        _process(images, outs, creator)


GENERATORS = {
    "chairs": generate_chairs,
    "things": generate_things,
    "sintel": generate_sintel,
    "kitti": generate_kitti,
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True, choices=sorted(GENERATORS))
    parser.add_argument("--data-root", required=True)
    parser.add_argument("--mask-root", required=True)
    parser.add_argument("--mask-type", default="orb", choices=sorted(MASK_CREATORS))
    args = parser.parse_args()
    GENERATORS[args.dataset](args.data_root, args.mask_root, args.mask_type)


if __name__ == "__main__":
    main()
