#!/usr/bin/env python
"""Wall-clock of a full synthetic validation pass (chairs+sintel+kitti) on TPU.

VERDICT r2 item 2: KITTI frames come in several native resolutions; without
bucketing each distinct shape paid a multi-minute XLA compile. With the
round-3 shape bucketing (`train/evaluate.py`), one compile per dataset
covers the pass. This scripts builds synthetic datasets at the REAL native
shapes and times validate_chairs / validate_sintel / validate_kitti.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_validation.py [n_per_set]
"""

import sys
import time

import numpy as np


class SyntheticFlowSet:
    """N samples at given (possibly varying) native shapes."""

    def __init__(self, shapes, sparse=False, seed=0):
        self.shapes = shapes
        self.sparse = sparse
        self.rng = np.random.RandomState(seed)
        self._cache = {}

    def __len__(self):
        return len(self.shapes)

    def __getitem__(self, i):
        if i in self._cache:
            return self._cache[i]
        h, w = self.shapes[i]
        rng = np.random.RandomState(1000 + i)
        m1 = np.zeros((h, w, 1), np.float32)
        m1[::11, ::13] = 255.0
        s = {
            "image1": (rng.rand(h, w, 3) * 255).astype(np.float32),
            "image2": (rng.rand(h, w, 3) * 255).astype(np.float32),
            "mask1": m1,
            "mask2": np.full((h, w, 1), 255.0, np.float32),
            "flow": (rng.randn(h, w, 2) * 3).astype(np.float32),
        }
        if self.sparse:
            s["valid"] = (rng.rand(h, w) > 0.5).astype(np.float32)
        self._cache[i] = s
        return s


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ff_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from focusflow_official_tpu.models import FFRaft, FFRaftConfig
    from focusflow_official_tpu.train import evaluate as ev

    cfg = FFRaftConfig(fusion="parallel", fusion_type="1x1conv", fuse_cnet=True,
                       iters=12, compute_dtype="bfloat16", corr_impl="auto")
    model = FFRaft(cfg)
    rng = np.random.RandomState(0)
    init = [jnp.asarray(rng.rand(1, 384, 512, c).astype(np.float32)) for c in (3, 3, 1, 1)]
    variables = model.init(jax.random.PRNGKey(0), *init, iters=1)

    chairs = SyntheticFlowSet([(384, 512)] * n)
    sintel = SyntheticFlowSet([(436, 1024)] * n)
    # the real KITTI-2015 shape zoo (several native resolutions)
    kitti_shapes = [(375, 1242), (370, 1224), (374, 1238), (376, 1241)]
    kitti = SyntheticFlowSet([kitti_shapes[i % 4] for i in range(n)], sparse=True)

    for name, fn in [
        ("chairs  (12 it, 384x512)", lambda: ev.validate_chairs(model, variables, chairs, iters=12)),
        ("sintel  (32 it, 436x1024)", lambda: ev.validate_sintel(
            model, variables, {"clean": sintel}, iters=32)),
        ("kitti   (24 it, 4 native shapes -> one 384x1248 bucket)",
         lambda: ev.validate_kitti(model, variables, kitti, iters=24)),
    ]:
        t0 = time.perf_counter()
        res = fn()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn()
        warm = time.perf_counter() - t0
        print(f"{name}: cold {cold:6.1f} s (incl. one compile), "
              f"warm {warm:6.1f} s = {warm/n*1000:6.0f} ms/frame   {res}")


if __name__ == "__main__":
    main()
