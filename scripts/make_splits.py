#!/usr/bin/env python
"""Write the custom KITTI/Sintel split listings.

Equivalent of the reference's misleadingly-named `test.py`
(`/root/reference/test.py:1-14`, which hardcodes a Windows path): lists the
`*_10.png` frames of a KITTI training folder into `KITTI_split.txt`. The
reference's committed `KITTI_split.txt` / `Sintel_split.txt` pin the custom
train/val splits (`README.md:60-61`); pass `--copy-reference` to reuse them.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil
from glob import glob


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kitti-root", help="KITTI training dir containing image_2/")
    parser.add_argument("--out", default="KITTI_split.txt")
    parser.add_argument("--copy-reference", default=None,
                        help="copy the pinned split files from this reference checkout")
    args = parser.parse_args()

    if args.copy_reference:
        for name in ("KITTI_split.txt", "Sintel_split.txt"):
            src = osp.join(args.copy_reference, name)
            if osp.exists(src):
                shutil.copyfile(src, name)
                print(f"copied {name}")
        return

    assert args.kitti_root
    frames = sorted(glob(osp.join(args.kitti_root, "image_2", "*_10.png")))
    with open(args.out, "w") as f:
        for p in frames:
            f.write(osp.basename(p) + "\n")
    print(f"wrote {len(frames)} entries to {args.out}")


if __name__ == "__main__":
    main()
