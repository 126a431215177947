"""Manual space-to-batch (row-chunked) CCE head must be exact.

The eval-time fnet chunks input rows into (B*nc) slabs with a 12-row halo
so the low-channel stem+layer1 convs run with a large batch (the
space-to-batch win XLA's own pass is vetoed out of by the Pallas IN-stats
custom call — BENCH.md round 3). Chunking must be invisible: instance
stats are combined exactly across slab cores, image-border virtual rows
are re-zeroed before every spatial conv, and the reassembled output must
match the unchunked path to f32 accumulation noise.

Reference semantics: `parallel_fusion.py:153-274` (single full-image
pass; chunking is a TPU-only execution detail, not a model change).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focusflow_official_tpu.nn.cce import (
    BasicParallelFusionLayer,
    _row_chunk_plan,
)


def _run(m, v, x, mask, chunked):
    os.environ["FF_CHUNKED_FNET"] = "1" if chunked else "0"
    try:
        return m.apply(v, x, mask, train=False)
    finally:
        os.environ.pop("FF_CHUNKED_FNET", None)


@pytest.mark.parametrize("h,w", [(160, 96), (440, 64)])
def test_chunked_cce_matches_unchunked(h, w):
    nc = _row_chunk_plan(h)
    assert nc is not None and nc > 1  # the shape must actually chunk

    m = BasicParallelFusionLayer(
        norm_fn="instance", fusion_type="1x1conv", dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, 3)) * 50.0
    mask = jax.random.normal(jax.random.PRNGKey(2), (2, h, w, 3)) * 50.0
    v = m.init(jax.random.PRNGKey(0), x, mask, train=False)

    ref = _run(m, v, x, mask, chunked=False)
    out = _run(m, v, x, mask, chunked=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=2e-3)


def test_chunked_cce_train_mode_values_and_grads():
    """FF_CHUNKED_FNET_TRAIN=1 chunks the TRAINING graph: forward values
    AND parameter gradients must match the unchunked train path (the
    row-chunk norm branch is pure jnp — exact combined stats, margins
    re-zeroed — so autodiff through it is the same math)."""
    # Inputs at the REALISTIC scale: the model normalizes images to [-1, 1]
    # before the CCE. (At a x50 stress scale the instance-norm BACKWARD is
    # ill-conditioned — d/dvar terms carry rsqrt(var)^3 — and f32
    # association noise in the chunk-combined stats amplifies to ~3e-2
    # relative on layer1 kernels, measured; at scale 1 the same comparison
    # sits at ~1e-5, i.e. the function is exact and the noise is float
    # association only.)
    h, w = 160, 64
    m = BasicParallelFusionLayer(
        norm_fn="instance", fusion_type="1x1conv", dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, 3))
    mask = jax.random.normal(jax.random.PRNGKey(2), (2, h, w, 3))
    v = m.init(jax.random.PRNGKey(0), x, mask, train=True)
    tgt = jax.random.normal(jax.random.PRNGKey(3), (2, h // 8, w // 8, 128))

    def loss(vv):
        out = m.apply(vv, x, mask, train=True)
        return jnp.mean((out - tgt) ** 2)

    ref_val, ref_grad = jax.value_and_grad(loss)(v)
    os.environ["FF_CHUNKED_FNET_TRAIN"] = "1"
    try:
        got_val, got_grad = jax.value_and_grad(loss)(v)
    finally:
        os.environ.pop("FF_CHUNKED_FNET_TRAIN", None)

    np.testing.assert_allclose(float(got_val), float(ref_val),
                               rtol=1e-5, atol=1e-6)
    # Per-leaf scale-aware tolerance: conv biases directly under an
    # instance norm have MATHEMATICALLY zero gradient (the mean
    # subtraction cancels the shift), so their residue is float noise at
    # ~1e-8 and absolute tolerance must key on each leaf's own scale.
    paths = jax.tree_util.tree_flatten_with_path(ref_grad)[0]
    flat_got = jax.tree_util.tree_leaves(got_grad)
    for (p, r), g in zip(paths, flat_got):
        r, g = np.asarray(r), np.asarray(g)
        tol = max(2e-4 * float(np.abs(r).max()), 2e-6)
        np.testing.assert_allclose(g, r, rtol=0, atol=tol,
                                   err_msg=jax.tree_util.keystr(p))


def test_chunked_gate_requires_instance_and_pixelwise_fusion():
    # batch norm / SA fusion must NOT take the chunked path (stats and
    # spatial pooling semantics differ) — outputs must be identical with
    # the env var either way.
    for norm_fn, ft in [("batch", "1x1conv"), ("instance", "SA")]:
        m = BasicParallelFusionLayer(
            norm_fn=norm_fn, fusion_type=ft, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 160, 64, 3))
        mask = jax.random.normal(jax.random.PRNGKey(2), (1, 160, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x, mask, train=False)
        a = _run(m, v, x, mask, chunked=True)
        b = _run(m, v, x, mask, chunked=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_cce_under_batch_sharded_mesh():
    """The B -> B*nc chunk reshape must survive GSPMD with the batch axis
    sharded over 8 data-parallel devices (the multi-chip eval path):
    sharded+chunked output == single-device unchunked, to chunk tolerance."""
    from focusflow_official_tpu.train.mesh import make_mesh, put_batch, replicate

    h, w, b = 160, 64, 8
    m = BasicParallelFusionLayer(
        norm_fn="instance", fusion_type="1x1conv", dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 3)) * 50.0
    mask = jax.random.normal(jax.random.PRNGKey(2), (b, h, w, 3)) * 50.0
    v = m.init(jax.random.PRNGKey(0), x, mask, train=False)

    want = _run(m, v, x, mask, chunked=False)

    mesh = make_mesh(jax.devices()[:8])
    batch = put_batch({"x": np.asarray(x), "mask": np.asarray(mask)}, mesh)
    v_r = jax.device_put(v, replicate(mesh))
    os.environ["FF_CHUNKED_FNET"] = "1"
    try:
        got = jax.jit(lambda vv, xx, mm: m.apply(vv, xx, mm, train=False))(
            v_r, batch["x"], batch["mask"])
    finally:
        os.environ.pop("FF_CHUNKED_FNET", None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=2e-3)


def test_chunk_plan_divisibility():
    # bench shape 440 -> the largest in-band core (55 rows, nc=4 — the
    # measured winner of BENCH.md Finding 14); indivisible heights opt out
    assert _row_chunk_plan(440) == 4
    assert _row_chunk_plan(446) is None  # 223 is prime
    for h in (160, 200, 320, 440, 480, 768):
        nc = _row_chunk_plan(h)
        if nc is not None:
            assert (h // 2) % nc == 0 and nc > 1
