#!/usr/bin/env python
"""Profile the bench.py forward on TPU and print an xprof hlo_stats summary.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_forward.py [outdir]

Prints per-category totals plus the top-N self-time HLO ops so perf work
can target the actual money (BENCH.md methodology).
"""

import collections
import glob
import json
import sys

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ff_prof_r3"
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ff_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from focusflow_official_tpu.models import FFRaft, FFRaftConfig
    from focusflow_official_tpu.ops.padding import InputPadder

    h, w, iters, batch = 436, 1024, 12, 1
    cfg = FFRaftConfig(
        fusion="parallel", fusion_type="1x1conv", fuse_cnet=True,
        iters=iters, compute_dtype="bfloat16", corr_impl="auto",
    )
    model = FFRaft(cfg)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray((rng.rand(batch, h, w, 3) * 255).astype(np.float32))
    img2 = jnp.asarray((rng.rand(batch, h, w, 3) * 255).astype(np.float32))
    mask1 = jnp.asarray((rng.rand(batch, h, w, 1) > 0.995).astype(np.float32) * 255)
    mask2 = jnp.asarray((rng.rand(batch, h, w, 1) > 0.995).astype(np.float32) * 255)
    padder = InputPadder(img1.shape)
    img1, img2, mask1, mask2 = padder.pad(img1, img2, mask1, mask2)
    variables = model.init(jax.random.PRNGKey(0), img1, img2, mask1, mask2, iters=1)

    @jax.jit
    def forward(v, a, b, c, d):
        _, flow_up = model.apply(v, a, b, c, d, iters=iters, test_mode=True)
        return jnp.sum(flow_up)

    _ = float(forward(variables, img1, img2, mask1, mask2))  # compile
    jax.profiler.start_trace(outdir)
    for _ in range(10):
        r = forward(variables, img1, img2, mask1, mask2)
    _ = float(r)
    jax.profiler.stop_trace()

    from xprof.convert import raw_to_tool_data

    paths = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data([max(paths)], "hlo_stats", {})
    table = json.loads(data)
    if isinstance(table, dict):
        hdr = [c.get("label", c.get("id")) if isinstance(c, dict) else c
               for c in table["cols"]]
        rows = [[c["v"] if isinstance(c, dict) else c
                 for c in (r["c"] if isinstance(r, dict) else r)]
                for r in table["rows"]]
    else:
        hdr = [c["label"] if isinstance(c, dict) else c for c in table[0]]
        rows = table[1:]
    idx = {name: i for i, name in enumerate(hdr)}
    cat_i = idx["HLO op category"]
    self_i = idx["Total self time (us)"]
    name_i = idx["HLO op name"]
    expr_i = idx["HLO op text"]
    bound_i = idx.get("Bound by")

    cats = collections.Counter()
    ops = []
    for r in rows[1:]:
        cats[r[cat_i]] += r[self_i]
        ops.append((r[self_i], r[cat_i], r[name_i],
                    (r[bound_i] if bound_i is not None else ""),
                    str(r[expr_i])[:200]))
    total = sum(cats.values())
    print(f"== category totals (us, /10 runs) — total {total:.0f} us = {total/10/1000:.2f} ms/run ==")
    for c, v in cats.most_common():
        print(f"  {v/10/1000:8.3f} ms  {c}")
    print("== top 40 ops by self time ==")
    for v, c, n, b, e in sorted(ops, reverse=True)[:40]:
        print(f"  {v/10/1000:8.3f} ms  [{c}] {n} ({b})\n      {e}")


if __name__ == "__main__":
    main()
