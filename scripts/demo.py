#!/usr/bin/env python
"""Demo: predict flow for a frame pair and write a Middlebury color PNG.

    python scripts/demo.py --yaml <cfg.yaml> --checkpoint <export|.pth> \
        --image1 a.png --image2 b.png [--mask1 m1.png --mask2 m2.png] \
        [--out flow.png] [--flo flow.flo] [--iters N]

The reference has no demo entry point (inference lives inside its
evaluation scripts); this is the user-facing pair:
`predict.FlowPredictor` -> `data/flow_viz.flow_to_image`.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--yaml", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--image1", required=True)
    ap.add_argument("--image2", required=True)
    ap.add_argument("--mask1", default=None)
    ap.add_argument("--mask2", default=None)
    ap.add_argument("--out", default="flow.png")
    ap.add_argument("--flo", default=None, help="also save raw .flo")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--compute-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--corr-impl", default="auto")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ff_tpu_cache")

    import numpy as np

    from focusflow_official_tpu.data.flow_viz import flow_to_image
    from focusflow_official_tpu.data.io import read_gen, write_flo
    from focusflow_official_tpu.predict import FlowPredictor

    img1 = np.asarray(read_gen(args.image1), np.float32)
    img2 = np.asarray(read_gen(args.image2), np.float32)
    m1 = None if args.mask1 is None else np.asarray(read_gen(args.mask1), np.float32)
    m2 = None if args.mask2 is None else np.asarray(read_gen(args.mask2), np.float32)

    pred = FlowPredictor(args.yaml, args.checkpoint, iters=args.iters,
                         compute_dtype=args.compute_dtype,
                         corr_impl=args.corr_impl)
    flow = pred(img1, img2, m1, m2)

    from PIL import Image

    Image.fromarray(flow_to_image(flow)).save(args.out)
    if args.flo:
        write_flo(args.flo, flow)
    mag = np.linalg.norm(flow, axis=-1)
    print(f"flow {flow.shape[0]}x{flow.shape[1]} -> {args.out} "
          f"(|flow| mean {mag.mean():.2f}, max {mag.max():.2f})")


if __name__ == "__main__":
    main()
