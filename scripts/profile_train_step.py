#!/usr/bin/env python
"""Profile the chairs train step on TPU; attribute the data-formatting tax.

VERDICT r2 item 8: 129 of 466 ms/step is 'data formatting'. This dumps
per-category totals and the hottest formatting/copy ops WITH their
framework scopes so the backward relayouts can be named.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train_step.py [outdir]
"""

import collections
import glob
import json
import sys

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ff_prof_train"
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ff_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from focusflow_official_tpu.losses import build_sequence_loss
    from focusflow_official_tpu.models import FFRaft, FFRaftConfig
    from focusflow_official_tpu.train.loop import (
        build_optimizer, create_train_state, make_train_step)
    from focusflow_official_tpu.train.schedule import one_cycle_lr

    b, h, w = 6, 368, 496
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
    step = make_train_step(loss_fn, iters=12, add_noise=True)

    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, key)
    _ = float(metrics["loss"])
    jax.profiler.start_trace(outdir)
    for _ in range(5):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
    _ = float(metrics["loss"])
    jax.profiler.stop_trace()

    from xprof.convert import raw_to_tool_data

    paths = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data([max(paths)], "hlo_stats", {})
    table = json.loads(data)
    hdr = [c.get("label", c.get("id")) if isinstance(c, dict) else c
           for c in table["cols"]]
    rows = [[c["v"] if isinstance(c, dict) else c
             for c in (r["c"] if isinstance(r, dict) else r)] for r in table["rows"]]
    idx = {n: i for i, n in enumerate(hdr)}
    cat_i, self_i = idx["HLO op category"], idx["Total self time (us)"]
    fw_i, txt_i = idx["Framework op name"], idx["HLO op text"]

    cats = collections.Counter()
    for r in rows:
        cats[r[cat_i]] += r[self_i]
    total = sum(cats.values())
    print(f"== categories ({total/5/1000:.1f} ms/step on-device) ==")
    for c, v in cats.most_common(10):
        print(f"  {v/5/1000:8.2f} ms  {c}")

    print("== top 30 data-formatting / copy ops ==")
    fmt = [r for r in rows if "formatting" in str(r[cat_i]) or str(r[cat_i]) == "copy"]
    for r in sorted(fmt, key=lambda r: -r[self_i])[:30]:
        print(f"  {r[self_i]/5/1000:7.3f} ms  {str(r[fw_i])[-90:]}\n"
              f"      {str(r[txt_i])[:160]}")


if __name__ == "__main__":
    main()
