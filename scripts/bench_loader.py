#!/usr/bin/env python
"""Input-pipeline throughput: Loader samples/s with real augmentation.

Generates a FlyingChairs-layout synthetic dataset at the real chairs
resolution (384x512), then measures the training Loader (decode + dense
augmentation + collate) at the chairs stage shape (368x496 crop, B=6).

Demand context (BENCH.md): the chairs train step is ~466 ms at B=6 ->
one chip consumes ~12.9 samples/s; a v5e-8 data-parallel pod needs ~103.

Usage: python scripts/bench_loader.py [n_images] [workers ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(root: str, n: int):
    import cv2
    from PIL import Image

    from focusflow_official_tpu.data.io import write_flo

    data = os.path.join(root, "FlyingChairs_release", "data")
    maskd = os.path.join(root, "mask", "FlyingChairs_release", "orb")
    if os.path.exists(os.path.join(data, f"{n:05d}_img1.ppm")):
        return
    os.makedirs(data, exist_ok=True)
    os.makedirs(maskd, exist_ok=True)
    rng = np.random.RandomState(0)
    h, w = 384, 512
    for i in range(1, n + 1):
        img1 = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        dx, dy = rng.randint(-5, 6), rng.randint(-5, 6)
        img2 = np.roll(np.roll(img1, dy, 0), dx, 1)
        flow = np.zeros((h, w, 2), np.float32)
        flow[..., 0], flow[..., 1] = dx, dy
        Image.fromarray(img1).save(f"{data}/{i:05d}_img1.ppm")
        Image.fromarray(img2).save(f"{data}/{i:05d}_img2.ppm")
        write_flo(f"{data}/{i:05d}_flow.flo", flow)
        for tag in ("img1", "img2"):
            m = ((rng.rand(h, w) > 0.97) * 255).astype(np.uint8)
            cv2.imwrite(f"{maskd}/{i:05d}_{tag}.png", m)
    np.savetxt(os.path.join(root, "FlyingChairs_release", "FlyingChairs_train_val.txt"),
               np.ones(n, np.int32), fmt="%d")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    workers = [int(x) for x in sys.argv[2:]] or [1, 4, 8, 16]
    root = "/tmp/ff_loader_bench"
    make_data(root, n)

    from focusflow_official_tpu.data.datasets import FlyingChairs
    from focusflow_official_tpu.data.loader import Loader

    aug_params = {"crop_size": (368, 496), "min_scale": -0.1, "max_scale": 1.0,
                  "do_flip": True}
    ds = FlyingChairs(aug_params=aug_params, split="training",
                      root=os.path.join(root, "FlyingChairs_release"),
                      mask_root=os.path.join(root, "mask", "FlyingChairs_release"),
                      mask_type="orb")

    # single-sample cost (decode+augment, no threading)
    t0 = time.perf_counter()
    for i in range(16):
        _ = ds[i % len(ds)]
    per_sample = (time.perf_counter() - t0) / 16
    print(f"single-thread dataset[i]: {per_sample*1000:.1f} ms/sample "
          f"({1/per_sample:.1f} samples/s)")

    for nw in workers:
        loader = Loader(ds, batch_size=6, num_workers=nw, seed=1)
        it = loader.batches()
        for _ in range(4):  # warmup: fill prefetch
            next(it)
        n_batches = 30
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(it)
        dt = time.perf_counter() - t0
        sps = n_batches * 6 / dt
        print(f"workers={nw:2d}: {sps:7.1f} samples/s "
              f"({dt/n_batches*1000:.0f} ms/batch of 6)")


if __name__ == "__main__":
    main()
