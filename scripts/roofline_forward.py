#!/usr/bin/env python
"""Roofline for the FF-RAFT bench forward (VERDICT r2 item 1 'done' bar).

Pulls FLOP and HBM-byte totals from XLA's compiled cost analysis for the
exact program bench.py runs, and compares the measured wall time against
the compute roofline (peak MXU bf16), the memory roofline (HBM bandwidth),
and their max — the attainable-time lower bound for this program as
compiled. Prints the fraction of attainable actually achieved.

v5e peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline_forward.py
"""

import json
import time

import numpy as np

PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ff_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from focusflow_official_tpu.models import FFRaft, FFRaftConfig
    from focusflow_official_tpu.ops.padding import InputPadder

    h, w, iters, batch = 436, 1024, 12, 1
    cfg = FFRaftConfig(fusion="parallel", fusion_type="1x1conv", fuse_cnet=True,
                       iters=iters, compute_dtype="bfloat16", corr_impl="auto")
    model = FFRaft(cfg)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray((rng.rand(batch, h, w, 3) * 255).astype(np.float32))
    img2 = jnp.asarray((rng.rand(batch, h, w, 3) * 255).astype(np.float32))
    mask1 = jnp.asarray((rng.rand(batch, h, w, 1) > 0.995).astype(np.float32) * 255)
    mask2 = jnp.asarray((rng.rand(batch, h, w, 1) > 0.995).astype(np.float32) * 255)
    padder = InputPadder(img1.shape)
    img1, img2, mask1, mask2 = padder.pad(img1, img2, mask1, mask2)
    variables = model.init(jax.random.PRNGKey(0), img1, img2, mask1, mask2, iters=1)

    def forward(v, a, b, c, d):
        _, flow_up = model.apply(v, a, b, c, d, iters=iters, test_mode=True)
        return jnp.sum(flow_up)

    compiled = jax.jit(forward).lower(variables, img1, img2, mask1, mask2).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)

    fn = jax.jit(forward)
    _ = float(fn(variables, img1, img2, mask1, mask2))
    n, best = 20, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n - 1):
            fn(variables, img1, img2, mask1, mask2)
        _ = float(fn(variables, img1, img2, mask1, mask2))
        best = min(best, (time.perf_counter() - t0) / n)

    t_compute = flops / (PEAK_BF16_TFLOPS * 1e12)
    t_memory = bytes_acc / (PEAK_HBM_GBS * 1e9)
    t_bound = max(t_compute, t_memory)
    out = {
        "flops_G": round(flops / 1e9, 1),
        "hbm_bytes_MB": round(bytes_acc / 1e6, 1),
        "arith_intensity_flop_per_byte": round(flops / bytes_acc, 1),
        "t_compute_roofline_ms": round(t_compute * 1e3, 2),
        "t_memory_roofline_ms": round(t_memory * 1e3, 2),
        "t_attainable_ms": round(t_bound * 1e3, 2),
        "t_measured_ms": round(best * 1e3, 2),
        "fraction_of_attainable": round(t_bound / best, 3),
        "fps_measured": round(1.0 / best, 2),
        "fps_at_roofline": round(1.0 / t_bound, 1),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
