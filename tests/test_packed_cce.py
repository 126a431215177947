"""Packed branch-pair CCE head must be invisible.

`FF_PACKED_CCE` runs the image+mask branches of the chunked stem+layer1
region on ONE 128-channel tensor with block-diagonal kernels built at
trace time from the unchanged per-branch parameters (`nn/cce.py`). Two
contracts:

1. the parameter tree (names, shapes, AND init values) is bit-identical
   to the unpacked module — checkpoints and the torch importer see no
   difference;
2. outputs match the unpacked chunked path to float-association noise
   (the extra zero-block MXU products add exact zeros).

Reference semantics: `parallel_fusion.py:153-274` — packing, like the
row chunking, is a TPU execution detail, not a model change.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from focusflow_official_tpu.nn.cce import (
    BasicParallelFusionLayer,
    _row_chunk_plan,
)


def _run(m, v, x, mask, packed):
    os.environ["FF_CHUNKED_FNET"] = "1"
    os.environ["FF_PACKED_CCE"] = "1" if packed else "0"
    try:
        return m.apply(v, x, mask, train=False)
    finally:
        os.environ.pop("FF_CHUNKED_FNET", None)
        os.environ.pop("FF_PACKED_CCE", None)


def test_packed_param_tree_identical():
    """Init through the packed graph must produce the exact same pytree
    (paths, shapes, and VALUES — the `_ConvParams` mirrors must hit the
    same RNG fold paths as the real conv modules)."""
    m = BasicParallelFusionLayer(
        norm_fn="instance", fusion_type="1x1conv", dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 160, 64, 3))
    mask = jax.random.normal(jax.random.PRNGKey(2), (2, 160, 64, 3))

    os.environ["FF_CHUNKED_FNET"] = "1"
    try:
        os.environ["FF_PACKED_CCE"] = "0"
        v_plain = m.init(jax.random.PRNGKey(0), x, mask, train=False)
        os.environ["FF_PACKED_CCE"] = "1"
        v_packed = m.init(jax.random.PRNGKey(0), x, mask, train=False)
    finally:
        os.environ.pop("FF_CHUNKED_FNET", None)
        os.environ.pop("FF_PACKED_CCE", None)

    flat_a = jax.tree_util.tree_flatten_with_path(v_plain)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(v_packed)[0]
    paths_a = [jax.tree_util.keystr(p) for p, _ in flat_a]
    paths_b = [jax.tree_util.keystr(p) for p, _ in flat_b]
    assert paths_a == paths_b
    for (p, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(p))


def test_packed_matches_unpacked_chunked():
    h, w = 160, 96
    nc = _row_chunk_plan(h)
    assert nc is not None and nc > 1
    m = BasicParallelFusionLayer(
        norm_fn="instance", fusion_type="1x1conv", dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, 3)) * 50.0
    mask = jax.random.normal(jax.random.PRNGKey(2), (2, h, w, 3)) * 50.0
    v = m.init(jax.random.PRNGKey(0), x, mask, train=False)

    ref = _run(m, v, x, mask, packed=False)
    out = _run(m, v, x, mask, packed=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=2e-3)


def _mk_bn(h=120, w=64, mask_ch=3):
    """Batch-norm CCE (the fused cnet shape) with non-trivial running
    stats/affine so the eval normalization actually does something."""
    m = BasicParallelFusionLayer(
        norm_fn="batch", fusion_type="1x1conv", dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, 3)) * 10.0
    mask = jax.random.normal(jax.random.PRNGKey(2), (2, h, w, mask_ch))
    if mask_ch == 1:
        mask = (mask > 1.0).astype(jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, mask, train=False)
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        if a.ndim == 1 else a,
        v["batch_stats"])
    v = dict(v)
    v["batch_stats"] = jax.tree_util.tree_map(jnp.abs, stats)
    return m, v, x, mask


def test_packed_bn_param_tree_identical():
    """The BN mirrors must declare the identical params AND batch_stats
    trees (paths, shapes, values) the unpacked modules would."""
    m = BasicParallelFusionLayer(
        norm_fn="batch", fusion_type="1x1conv", dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 120, 64, 3))
    mask = jax.random.normal(jax.random.PRNGKey(2), (2, 120, 64, 3))
    try:
        os.environ["FF_PACKED_CCE_BN"] = "0"
        v_plain = m.init(jax.random.PRNGKey(0), x, mask, train=False)
        os.environ["FF_PACKED_CCE_BN"] = "1"
        v_packed = m.init(jax.random.PRNGKey(0), x, mask, train=False)
    finally:
        os.environ.pop("FF_PACKED_CCE_BN", None)

    flat_a = jax.tree_util.tree_flatten_with_path(v_plain)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(v_packed)[0]
    paths_a = [jax.tree_util.keystr(p) for p, _ in flat_a]
    paths_b = [jax.tree_util.keystr(p) for p, _ in flat_b]
    assert paths_a == paths_b
    assert any("mask_layer1_0" in p and "norm1" in p and "mean" in p
               for p in paths_a)
    for (p, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(p))


def test_packed_bn_matches_unpacked():
    m, v, x, mask = _mk_bn()
    try:
        os.environ["FF_PACKED_CCE_BN"] = "0"
        ref = m.apply(v, x, mask, train=False)
        os.environ["FF_PACKED_CCE_BN"] = "1"
        out = m.apply(v, x, mask, train=False)
    finally:
        os.environ.pop("FF_PACKED_CCE_BN", None)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=2e-3)


def test_packed_bn_tiled_mask():
    m, v, x, mask = _mk_bn(mask_ch=1)
    try:
        os.environ["FF_PACKED_CCE_BN"] = "0"
        ref = m.apply(v, x, mask, train=False)
        os.environ["FF_PACKED_CCE_BN"] = "1"
        out = m.apply(v, x, mask, train=False)
    finally:
        os.environ.pop("FF_PACKED_CCE_BN", None)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=2e-3)


def test_packed_single_channel_tiled_mask():
    """The production eval path feeds a 1-channel tiled-mask stand-in
    (TiledInputConv); the packed head must handle it identically."""
    h, w = 160, 64
    m = BasicParallelFusionLayer(
        norm_fn="instance", fusion_type="1x1conv", dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, 3))
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (2, h, w, 1)) > 0.9
            ).astype(jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, mask, train=False)

    ref = _run(m, v, x, mask, packed=False)
    out = _run(m, v, x, mask, packed=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=2e-3)


def test_packed_stem_ch_matches(monkeypatch):
    """FF_PACKED_STEM=ch (BENCH.md Finding 13, the round-5 default): both
    stems as one dense conv over channel-concatenated inputs == the
    separate-stems form, for 3-channel and 1-channel (tiled) masks."""
    h, w = 160, 96
    for mask_ch in (3, 1):
        m = BasicParallelFusionLayer(
            norm_fn="instance", fusion_type="1x1conv", dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, 3)) * 50.0
        mask = jax.random.normal(jax.random.PRNGKey(2), (2, h, w, mask_ch))
        if mask_ch == 1:
            mask = (mask > 1.0).astype(jnp.float32)
        monkeypatch.setenv("FF_PACKED_STEM", "0")
        v = m.init(jax.random.PRNGKey(0), x, mask, train=False)
        ref = m.apply(v, x, mask, train=False)
        monkeypatch.setenv("FF_PACKED_STEM", "ch")
        out = m.apply(v, x, mask, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=2e-3)
