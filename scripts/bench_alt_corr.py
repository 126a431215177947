#!/usr/bin/env python
"""Large-frame scaling: materialized corr volume vs ALT_CORR.

At 1024x436 the all-pairs volume is 99 MB; it grows with the 4th power of
resolution and stops fitting v5e HBM (16 GB) around 2K frames, where the
reference's answer is the CUDA AlternateCorrBlock (`corr.py:63-91`) and
ours is `alternate_corr_lookup`. This prints fps for both paths across
resolutions; OOM rows are reported as such.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_alt_corr.py [small|large]
"""

import sys
import time

import numpy as np


def run(h, w, alt, iters=12):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ff_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from focusflow_official_tpu.models import FFRaft, FFRaftConfig
    from focusflow_official_tpu.ops.padding import InputPadder

    cfg = FFRaftConfig(
        fusion="parallel", fusion_type="1x1conv", fuse_cnet=True,
        iters=iters, compute_dtype="bfloat16", corr_impl="auto",
        alt_corr=alt, alt_corr_chunk=2048,
    )
    model = FFRaft(cfg)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray((rng.rand(1, h, w, 3) * 255).astype(np.float32))
    img2 = jnp.asarray((rng.rand(1, h, w, 3) * 255).astype(np.float32))
    mask1 = jnp.asarray((rng.rand(1, h, w, 1) > 0.995).astype(np.float32) * 255)
    mask2 = jnp.asarray(np.full((1, h, w, 1), 255.0, np.float32))
    padder = InputPadder(img1.shape)
    img1, img2, mask1, mask2 = padder.pad(img1, img2, mask1, mask2)
    variables = model.init(jax.random.PRNGKey(0), img1, img2, mask1, mask2, iters=1)

    @jax.jit
    def forward(v, a, b, c, d):
        _, flow_up = model.apply(v, a, b, c, d, iters=iters, test_mode=True)
        return jnp.sum(flow_up)

    _ = float(forward(variables, img1, img2, mask1, mask2))
    n, best = 10, float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n - 1):
            forward(variables, img1, img2, mask1, mask2)
        _ = float(forward(variables, img1, img2, mask1, mask2))
        best = min(best, (time.perf_counter() - t0) / n)
    q = (h // 8 + 1) * (w // 8)
    vol_gb = q * q * 2 / 1e9
    print(f"{h}x{w} alt={alt}: {1/best:6.2f} fps  (volume would be {vol_gb:.2f} GB)",
          flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "small"
    shapes = {"small": [(436, 1024)], "large": [(768, 1536), (1080, 1920)],
              "huge": [(1440, 2560)]}[mode]
    for h, w in shapes:
        for alt in (False, True):
            try:
                run(h, w, alt)
            except Exception as e:  # noqa: BLE001 — report OOM rows
                msg = str(e).split("\n")[0][:140]
                print(f"{h}x{w} alt={alt}: FAILED ({msg})", flush=True)
