#!/usr/bin/env python
"""Microbench: Mosaic stage-2+fold kernel vs the production XLA stage 2.

Isolates the lookup's stage-2 machinery at exact bench shapes (B=1,
Q=7040, H2=55, LK=36, cout=256): from a given stage-1 output t and query
y-coords cy, compute the folded convc1 result. The XLA arm mirrors the
production ops exactly (hoisted-base sy build -> per-level stage-2
einsums -> per-level fold dots, `ops/corr.py::lookup_corr_fused_chunks` +
`nn/update.py::ChunkFoldedConv1x1`); the kernel arms run
`kernels.stage2.stage2_fold` with the in-kernel transpose and with the
XLA-side pre-transpose. N=30 serialized repetitions inside one jit (data
dependence through cy), harness floor subtracted per BENCH.md
methodology. Usage:
  PYTHONPATH=/root/repo:$HOME/.axon_site python scripts/bench_stage2_kernel.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from focusflow_official_tpu.ops.corr import (
    _block_tent_weights_t_base, _pool_sizes)
from focusflow_official_tpu.kernels.stage2 import stage2_fold

B, H2, W2, R, L = 1, 55, 128, 4, 4
K = 2 * R + 1
Q = H2 * W2
LK = L * K
COUT = 256
N = 30


def xla_stage2_fold(t, cy, wp_ref, bias):
    """Production stage 2 + fold from (t, cy): mirrors
    lookup_corr_fused_chunks' FF_TENT_BASE=1 default + ChunkFoldedConv1x1's
    per-level dots (wp_ref in REFERENCE order: rows l*K2 + i*K + j)."""
    d = jnp.bfloat16
    dvec = jnp.linspace(-R, R, K, dtype=jnp.float32)
    sizes = _pool_sizes(H2, W2, L)
    sy_all = jnp.concatenate(
        [_block_tent_weights_t_base(cy / (2.0 ** l), dvec, l, H2, hl)
         for l, (hl, _) in enumerate(sizes)], axis=-1).astype(d)
    acc = None
    for l in range(L):
        o = jnp.einsum("bqyj,bqyi->bqji",
                       sy_all[:, :, :, l * K:(l + 1) * K],
                       t[:, :, :, l * K:(l + 1) * K],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        wl = wp_ref[l * K * K:(l + 1) * K * K].reshape(K, K, COUT)
        y = jnp.einsum("bqji,ijo->bqo", o.astype(d), wl.astype(d),
                       precision=jax.lax.Precision.HIGHEST)
        acc = y if acc is None else acc + y
    return acc + bias.astype(d)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/ff_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    t = jnp.asarray(rng.randn(B, Q, H2, LK), jnp.bfloat16)
    cy0 = jnp.asarray(rng.rand(B, Q) * (H2 - 1), jnp.float32)
    w_ref = jnp.asarray(rng.randn(LK * K, COUT) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(COUT) * 0.01, jnp.float32)
    sizes = [hl for hl, _ in _pool_sizes(H2, W2, L)]

    idx = np.array([l * K * K + i * K + j
                    for l in range(L) for j in range(K) for i in range(K)])
    wp_chunk = jnp.asarray(np.asarray(w_ref)[idx], jnp.bfloat16)

    def serialize(fn):
        # data-dependent cy chain; nonlinear so XLA can't cancel it
        def body(cy, _):
            out = fn(cy)
            cy2 = jnp.abs(out[..., 0].astype(jnp.float32)) % (H2 - 1.0)
            return cy2, out[0, 0, 0]
        @jax.jit
        def run(cy):
            cy_fin, outs = jax.lax.scan(body, cy, None, length=N)
            return outs.sum() + cy_fin.sum()
        return run

    arms = {
        "xla_prod": serialize(
            lambda cy: xla_stage2_fold(t, cy, w_ref, bias)),
        "kernel_inkernel_T": serialize(
            lambda cy: stage2_fold(t, cy, wp_chunk, bias, R, sizes,
                                   transpose_in_kernel=True)),
        "kernel_xla_preT": serialize(
            lambda cy: stage2_fold(t, cy, wp_chunk, bias, R, sizes,
                                   transpose_in_kernel=False)),
    }

    # harness floor: same scan, trivial body
    def floor_fn(cy):
        return cy * cy + 1.0
    arms["floor"] = serialize(lambda cy: floor_fn(cy)[:, :, None] *
                              jnp.ones((1, 1, COUT), jnp.bfloat16))

    # correctness first (single call, f32-ish tolerance for bf16 math)
    ref = xla_stage2_fold(t, cy0, w_ref, bias)
    got = stage2_fold(t, cy0, wp_chunk, bias, R, sizes)
    err = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
    den = jnp.max(jnp.abs(ref.astype(jnp.float32)))
    print(f"max abs diff kernel vs XLA: {float(err):.4f} "
          f"(max |ref| {float(den):.2f})")

    for name, run in arms.items():
        v = float(run(cy0))  # compile + run
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(run(cy0))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:20s} {best / N * 1e3:8.3f} ms/call  (chk {v:.1f})")


if __name__ == "__main__":
    main()
