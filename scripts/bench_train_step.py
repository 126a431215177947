#!/usr/bin/env python
"""FF-RAFT chairs train-step wall clock on TPU, with/without device-aug.

Protocol (BENCH.md): B=6, 368x496 crop, 12 iters, bf16, MixLoss, full step
(noise aug, forward, backward, global clip, AdamW). With --device-aug the
batch arrives RAW at 384x512 and the augmentation runs inside the step.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_step.py [cpu|aug|both]
"""

import sys
import time

import numpy as np


def run(device_aug: bool):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ff_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from focusflow_official_tpu.losses import build_sequence_loss
    from focusflow_official_tpu.models import FFRaft, FFRaftConfig
    from focusflow_official_tpu.train.loop import (
        build_optimizer, create_train_state, make_train_step)
    from focusflow_official_tpu.train.schedule import one_cycle_lr

    b = 6
    if device_aug:
        from focusflow_official_tpu.data.device_aug import DeviceFlowAugmentor

        h, w = 384, 512  # raw chairs frames
        augmentor = DeviceFlowAugmentor((368, 496), -0.1, 1.0, do_flip=True)
    else:
        h, w = 368, 496
        augmentor = None

    rng = np.random.RandomState(0)
    batch = {
        "image1": jnp.asarray(rng.rand(b, h, w, 3) * 255, jnp.float32),
        "image2": jnp.asarray(rng.rand(b, h, w, 3) * 255, jnp.float32),
        "flow": jnp.asarray(rng.randn(b, h, w, 2) * 4, jnp.float32),
        "mask1": jnp.asarray((rng.rand(b, h, w, 1) > 0.99) * 255, jnp.float32),
        "mask2": jnp.asarray(np.full((b, h, w, 1), 255), jnp.float32),
        "valid": jnp.ones((b, h, w), jnp.float32),
    }

    cfg = FFRaftConfig(fusion="parallel", fusion_type="1x1conv", fuse_cnet=True,
                       iters=12, compute_dtype="bfloat16", corr_impl="auto")
    model = FFRaft(cfg)
    loss_fn = build_sequence_loss("MixLoss", gamma=0.8, max_flow=400,
                                  kernel_size=1, sigma=0.01, lamda=1.0)
    tx = build_optimizer(one_cycle_lr(4e-4, 1000), clip=1.0)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(loss_fn, iters=12, add_noise=True,
                           device_augmentor=augmentor)

    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, key)  # compile
    _ = float(metrics["loss"])
    n = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            key, k = jax.random.split(key)
            state, metrics = step(state, batch, k)
        _ = float(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / n)
    tag = "device-aug (raw 384x512 in-step)" if device_aug else "pre-augmented"
    print(f"{tag}: {best*1000:.1f} ms/step = {b/best:.1f} samples/s/chip")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("cpu", "both"):
        run(False)
    if mode in ("aug", "both"):
        run(True)
