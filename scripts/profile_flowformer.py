#!/usr/bin/env python
"""Profile the FF-FlowFormer forward on TPU (bench protocol shapes).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_flowformer.py [outdir]
Prints per-category totals, per-scope totals, and the top self-time ops.
"""

import collections
import glob
import json
import re
import sys

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ff_prof_former"
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ff_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from focusflow_official_tpu.models import FFFlowFormer, FlowFormerConfig
    from focusflow_official_tpu.ops.padding import InputPadder

    h, w = 436, 1024
    cfg = FlowFormerConfig(fusion="parallel", compute_dtype="bfloat16")
    model = FFFlowFormer(cfg)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray((rng.rand(1, h, w, 3) * 255).astype(np.float32))
    img2 = jnp.asarray((rng.rand(1, h, w, 3) * 255).astype(np.float32))
    mask1 = jnp.asarray((rng.rand(1, h, w, 1) > 0.995).astype(np.float32) * 255)
    mask2 = jnp.asarray((rng.rand(1, h, w, 1) > 0.995).astype(np.float32) * 255)
    padder = InputPadder(img1.shape)
    img1, img2, mask1, mask2 = padder.pad(img1, img2, mask1, mask2)
    variables = model.init(jax.random.PRNGKey(0), img1, img2, mask1, mask2)

    @jax.jit
    def forward(v, a, b, c, d):
        out = model.apply(v, a, b, c, d, test_mode=True)
        flow = out[1] if isinstance(out, (tuple, list)) else out
        return jnp.sum(flow)

    import time
    _ = float(forward(variables, img1, img2, mask1, mask2))
    t0 = time.perf_counter()
    for _ in range(10):
        r = forward(variables, img1, img2, mask1, mask2)
    _ = float(r)
    wall = (time.perf_counter() - t0) / 10
    print(f"wall: {wall*1000:.1f} ms/frame = {1/wall:.2f} fps")

    jax.profiler.start_trace(outdir)
    for _ in range(10):
        r = forward(variables, img1, img2, mask1, mask2)
    _ = float(r)
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
    cat_i = idx["HLO op category"]
    self_i = idx["Total self time (us)"]
    fw_i = idx["Framework op name"]
    txt_i = idx["HLO op text"]

    cats = collections.Counter()
    scopes = collections.Counter()
    for r in rows:
        cats[r[cat_i]] += r[self_i]
        fw = str(r[fw_i])
        m = re.search(r"(memory_encoder|memory_decoder|context_encoder|cost_perceiver|twins|svt|fusion)[\w.]*", fw)
        scopes[m.group(1) if m else fw.split("/")[2] if fw.count("/") > 1 else "(other)"] += r[self_i]
    total = sum(cats.values())
    print(f"== categories ({total/10/1000:.2f} ms/run on-device) ==")
    for c, v in cats.most_common(8):
        print(f"  {v/10/1000:8.3f} ms  {c}")
    print("== scopes ==")
    for c, v in scopes.most_common(12):
        print(f"  {v/10/1000:8.3f} ms  {c}")
    print("== top 25 ops ==")
    for r in sorted(rows, key=lambda r: -r[self_i])[:25]:
        print(f"  {r[self_i]/10/1000:7.3f} ms [{r[cat_i]}] {str(r[fw_i])[-70:]}\n"
              f"      {str(r[txt_i])[:150]}")


if __name__ == "__main__":
    main()
