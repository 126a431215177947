#!/usr/bin/env python
"""Inference fps for all three families at the bench protocol (436x1024,
bf16, B=1). FF-RAFT uses the exact bench.py configuration; PWC/FlowFormer
mirror it. Prints one line per family.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_families.py
           [raft] [pwc] [flowformer]
No args = all three. A subset skips the others' multi-minute cold compiles —
used for env-knob A/Bs (FF_FAST_GELU, FF_CORR_Q8) on one family.
(BENCH.md methodology: N queued dispatches ended by one scalar fetch.)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ff_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from focusflow_official_tpu.models import FFPWCNet, FFRaft, FFRaftConfig
from focusflow_official_tpu.models.ff_flowformer import (
    FFFlowFormer,
    FlowFormerConfig,
)
from focusflow_official_tpu.ops.padding import InputPadder

h, w = 436, 1024
rng = np.random.RandomState(0)
img1 = jnp.asarray((rng.rand(1, h, w, 3) * 255).astype(np.float32))
img2 = jnp.asarray((rng.rand(1, h, w, 3) * 255).astype(np.float32))
m1 = jnp.asarray((rng.rand(1, h, w, 1) > 0.995).astype(np.float32) * 255)
m2 = jnp.asarray((rng.rand(1, h, w, 1) > 0.995).astype(np.float32) * 255)


def bench(model, variables, name, args, iters=None):
    kw = {} if iters is None else {"iters": iters}

    @jax.jit
    def fwd(v, a, b, c, d):
        out = model.apply(v, a, b, c, d, test_mode=True, **kw)
        if isinstance(out, (tuple, list)):
            out = out[-1]
        return jnp.sum(out.astype(jnp.float32))

    _ = float(fwd(variables, *args))
    n, best = 20, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n - 1):
            fwd(variables, *args)
        _ = float(fwd(variables, *args))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {1.0 / best:.2f} fps/chip ({best * 1e3:.1f} ms)")


_sel = [a for a in sys.argv[1:] if not a.startswith("-")]
_want = lambda fam: not _sel or fam in _sel

pad = InputPadder(img1.shape)

if _want("raft"):
    # FF-RAFT (the headline bench.py protocol: /8-padded, 12 iters)
    rcfg = FFRaftConfig(fusion="parallel", fusion_type="1x1conv", fuse_cnet=True,
                        iters=12, compute_dtype="bfloat16", corr_impl="auto")
    raft = FFRaft(rcfg)
    rargs = pad.pad(img1, img2, m1, m2)
    vr = raft.init(jax.random.PRNGKey(0), *rargs, iters=1)
    bench(raft, vr, "ff-raft_1024x436_12iter_bf16", rargs, iters=12)

if _want("pwc"):
    pwc = FFPWCNet(FFRaftConfig(fusion="parallel", fusion_type="1x1conv",
                                compute_dtype="bfloat16"))
    vp = pwc.init(jax.random.PRNGKey(0), img1, img2, m1, m2)
    bench(pwc, vp, "ff-pwcnet_1024x436_bf16", (img1, img2, m1, m2))

if _want("flowformer"):
    fcfg = FlowFormerConfig(fusion="parallel", decoder_depth=12,
                            compute_dtype="bfloat16", corr_impl="auto")
    ff = FFFlowFormer(fcfg)
    vf = ff.init(jax.random.PRNGKey(0), img1[:, :64, :128], img2[:, :64, :128],
                 m1[:, :64, :128], m2[:, :64, :128])
    fargs = pad.pad(img1, img2, m1, m2)
    bench(ff, vf, "ff-flowformer_1024x436_12iter_bf16", fargs)
