"""Gates with TRAINED (non-chaotic) weights.

Round-2 verdict: every parity gate ran untrained nets, leaving the bf16
fast-path bound nearly vacuous and the eval protocol without same-weights
numbers from both stacks. The fixture `tests/fixtures/trained_smoke.npz`
is the smoke-chairs config trained 700 steps via `cli/train.py` on the
RICH `make_smoke_data --rich` set (64 textured affine-warp pairs with
exact dense GT — learnable but not memorizable, unlike the 8-pair
shift-only set a few hundred steps overfit): final/chairs AEPE 3.47 vs
~40 untrained; fp16-stored, ~14 MB. See BENCH.md round 3.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference
from flax import traverse_util

from focusflow_official_tpu.models import FFRaft, FFRaftConfig

pytestmark = pytest.mark.slow  # multi-minute suite; -m 'not slow' skips

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "trained_smoke.npz")


def _cfg(**kw):
    return FFRaftConfig(fusion="parallel", fusion_type="1x1conv",
                        fuse_cnet=True, iters=4, **kw)


def load_trained_variables():
    raw = np.load(FIXTURE)
    flat = {tuple(k.split("/")): jnp.asarray(raw[k], jnp.float32)
            for k in raw.files}
    return traverse_util.unflatten_dict(flat)


def _smoke_inputs(seed=0, h=96, w=128):
    rng = np.random.RandomState(seed)
    i1 = (rng.rand(1, h, w, 3) * 255).astype(np.float32)
    dx, dy = 3, -2
    i2 = np.roll(np.roll(i1, dy, 1), dx, 2)
    m1 = ((rng.rand(1, h, w, 1) > 0.97) * 255).astype(np.float32)
    m2 = ((rng.rand(1, h, w, 1) > 0.97) * 255).astype(np.float32)
    return i1, i2, m1, m2, (dx, dy)


def test_fixture_tree_matches_model():
    v = load_trained_variables()
    model = FFRaft(_cfg())
    i1, i2, m1, m2, _ = _smoke_inputs()
    template = model.init(jax.random.PRNGKey(0), *map(jnp.asarray,
                                                      (i1, i2, m1, m2)), iters=1)
    flat_t = set(traverse_util.flatten_dict(template))
    flat_v = set(traverse_util.flatten_dict(v))
    assert flat_t == flat_v


def test_trained_net_recovers_flow():
    """The trained net actually solved the synthetic constant-shift task —
    the precondition for every gate below being meaningful."""
    v = load_trained_variables()
    model = FFRaft(_cfg())
    i1, i2, m1, m2, (dx, dy) = _smoke_inputs()
    _, flow = model.apply(v, *map(jnp.asarray, (i1, i2, m1, m2)),
                          iters=12, test_mode=True)
    flow = np.asarray(flow)
    # interior epe well below the untrained ~image-scale chaos (~40 px);
    # current fixture (700 steps, rich affine data): ~3.4 px on unseen
    # white-noise probes (out-of-distribution for the textured train set)
    epe = np.sqrt(((flow[0, 8:-8, 8:-8] - np.array([dx, dy])) ** 2).sum(-1))
    assert float(epe.mean()) < 6.0, float(epe.mean())


def test_bf16_fast_path_trained_12iters():
    """bf16 + fused lookup vs f32 + xla lookup, TRAINED weights, 12 iters.

    Replaces the round-2 1-iter rel<0.15 untrained bound: with non-chaotic
    weights the full fast path must track the reference path to sub-pixel
    agreement over the whole refinement."""
    v = load_trained_variables()
    i1, i2, m1, m2, _ = _smoke_inputs(seed=1)
    args = list(map(jnp.asarray, (i1, i2, m1, m2)))
    _, f32_flow = FFRaft(_cfg(corr_impl="xla")).apply(
        v, *args, iters=12, test_mode=True)
    _, fast_flow = FFRaft(_cfg(corr_impl="fused", compute_dtype="bfloat16")).apply(
        v, *args, iters=12, test_mode=True)
    diff = np.abs(np.asarray(fast_flow) - np.asarray(f32_flow))
    mag = np.abs(np.asarray(f32_flow)).mean()
    assert float(diff.mean()) < 0.05 * max(float(mag), 1.0), (
        float(diff.mean()), float(mag))
    assert float(np.median(diff)) < 0.1


def test_corr_q8_trained():
    """FF_CORR_Q8 (int8 volume) with trained weights: flow must track the
    exact fused path within the ~1%-of-corr quantization budget's flow
    impact — a sub-0.1 px median over 12 refinements."""
    v = load_trained_variables()
    i1, i2, m1, m2, _ = _smoke_inputs(seed=3)
    args = list(map(jnp.asarray, (i1, i2, m1, m2)))
    model = FFRaft(_cfg(corr_impl="fused"))
    _, base = model.apply(v, *args, iters=12, test_mode=True)
    os.environ["FF_CORR_Q8"] = "1"
    try:
        _, q8 = model.apply(v, *args, iters=12, test_mode=True)
    finally:
        os.environ.pop("FF_CORR_Q8", None)
    diff = np.abs(np.asarray(q8) - np.asarray(base))
    assert float(np.median(diff)) < 0.1, float(np.median(diff))
    assert float(diff.mean()) < 0.25, float(diff.mean())


def test_alt_corr_trained():
    """ALT_CORR path with trained weights tracks the materialized path."""
    v = load_trained_variables()
    i1, i2, m1, m2, _ = _smoke_inputs(seed=2)
    args = list(map(jnp.asarray, (i1, i2, m1, m2)))
    _, base = FFRaft(_cfg(corr_impl="fused")).apply(
        v, *args, iters=8, test_mode=True)
    _, alt = FFRaft(_cfg(corr_impl="fused", alt_corr=True,
                         alt_corr_chunk=64)).apply(
        v, *args, iters=8, test_mode=True)
    np.testing.assert_allclose(np.asarray(alt), np.asarray(base),
                               atol=5e-3, rtol=1e-4)


@requires_reference
def test_eval_protocol_same_weights_both_stacks(ref_ffraft_modules):
    """AEPE + keypoint-EPE through OUR eval stack vs the reference protocol
    (`ff-raft/evaluate.py:18-46`) run in torch with the SAME trained
    weights (via the jax->torch exporter) on the same samples."""
    import argparse

    import torch

    from focusflow_official_tpu.compat.torch_import import (
        variables_to_torch_state_dict)
    from focusflow_official_tpu.train.evaluate import validate_chairs

    _, ref_ff_raft, _ = ref_ffraft_modules
    v = load_trained_variables()
    model = FFRaft(_cfg())

    samples = []
    rng = np.random.RandomState(11)
    for s in range(3):
        # >= 128x160: the reference model divides by zero below that
        # (1-px corr-pyramid level -> NaN; verify-skill gotcha)
        i1, i2, m1, m2, (dx, dy) = _smoke_inputs(seed=20 + s, h=128, w=160)
        flow = np.zeros((128, 160, 2), np.float32)
        flow[..., 0], flow[..., 1] = dx, dy
        samples.append({"image1": i1[0], "image2": i2[0], "mask1": m1[0],
                        "mask2": m2[0], "flow": flow})

    class DS:
        def __len__(self):
            return len(samples)

        def __getitem__(self, i):
            return samples[i]

    ours = validate_chairs(model, v, DS(), iters=12)

    # ---- torch side: reference model + reference protocol
    cfg = argparse.Namespace(
        MODEL=argparse.Namespace(FUSION_TYPE="1x1conv", LOAD_MODULE_TO_BRANCH=False),
        TRAIN=argparse.Namespace(MASK_CHANNEL=3, MASK_MODAL="point",
                                 MASK_DILATE=31, KERNEL_SIZE=31, KERNEL_SIGMA=5),
    )
    tmodel = ref_ff_raft.FF_RAFT_FUSION(
        use_fusion="parallel", fusion_channels=256, raft_small=False,
        fuse_cnet=True, cfg=cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(a))
          for k, a in variables_to_torch_state_dict(v).items()}
    tmodel.load_state_dict(sd, strict=False)
    tmodel.eval()

    epes, mepes = [], []
    t = lambda x: torch.from_numpy(x[None].transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        for s in samples:
            _, pr = tmodel(t(s["image1"]), t(s["image2"]), t(s["mask1"]),
                           t(s["mask2"]), raft_iters=12, test_mode=True)
            pr = pr[0].numpy().transpose(1, 2, 0)
            epe = np.sqrt(((pr - s["flow"]) ** 2).sum(-1))
            epes.append(epe.reshape(-1))
            sel = s["mask1"][..., 0] > 0.5
            mepes.append(epe[sel].mean())
    torch_aepe = float(np.concatenate(epes).mean())
    torch_mepe = float(np.mean(mepes))

    # same weights, same protocol: backend float drift only
    assert abs(ours["chairs"] - torch_aepe) < 0.05 * max(torch_aepe, 1.0), (
        ours, torch_aepe)
    assert abs(ours["chairs-orb"] - torch_mepe) < 0.05 * max(torch_mepe, 1.0), (
        ours, torch_mepe)
