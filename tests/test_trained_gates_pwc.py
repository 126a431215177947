"""Trained-weight gates for the FF-PWCNet family.

Round-3 extension of `test_trained_gates.py` (which covers FF-RAFT): the
fixture `tests/fixtures/trained_smoke_pwc.npz` is the smoke-pwc config
(MixLoss pretrain-L2 mode, 1x1conv CCE fusion) trained 700 steps via
`cli/train.py` on the `make_smoke_data --rich --motion shift
--max-shift 24` set (64 textured pairs, exact translation GT, |t|<=24 px).

Honest scope: SHORT-SCHEDULE PWC TRAINING DOES NOT CONVERGE. Every smoke
distribution tried sits at the zero-flow baseline — affine warps (val AEPE
3.75 vs baseline 3.71 after 2100 steps), subpixel shifts (2.78 vs 2.68
after 1400; the decoder's finest level is 1/4 resolution, so |t|<=4 px is
subpixel at EVERY level of the 81-bin integer-displacement correlation),
and +-24 px shifts (16.59 vs 16.11 after 1400; the coarsest levels are
STILL subpixel at /32 and /64, and the training augmentor's scale aug
widens the distribution further). This matches the family's published
training cost — the reference's own configs run 1.2M steps at batch 8
(`configs/ff-pwcnet/experiment/ffpwc_chairs_1200k.yaml`). That the
flatline is the reference's own behavior and not a port bug is gated
separately and directly: `test_trainer_parity_pwc.py` pins our train step
to the torch reference stack per-step (same weights + data, 40 steps).

What a 700-step checkpoint IS good for — and what these gates cover — is
exercising the numeric fast paths at full model scale with
real-training-moved (non-init, non-chaotic) weights: the bf16 compute
path vs f32, and the jax->torch exporter + eval protocol agreement across
both stacks, mirroring the reference protocol
(`/root/reference/core/models/ff-pwcnet/evaluate.py:18-56`). The
convergence-witness role that FF-RAFT's trained gate plays (AEPE 3.47 on
held-out probes, `test_trained_gates.py`) has no PWC analog by physics.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference
from flax import traverse_util

from focusflow_official_tpu.models import FFPWCNet, FFRaftConfig
from test_pwc_parity import ref_pwc_modules  # noqa: F401  (session fixture)

pytestmark = pytest.mark.slow

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "trained_smoke_pwc.npz")


def _cfg(**kw):
    return FFRaftConfig(fusion="parallel", fusion_type="1x1conv", **kw)


def load_trained_variables():
    raw = np.load(FIXTURE)
    flat = {tuple(k.split("/")): jnp.asarray(raw[k], jnp.float32)
            for k in raw.files}
    return traverse_util.unflatten_dict(flat)


def _textured_shift_pair(seed=0, h=128, w=192, dx=14, dy=-9):
    """Smoothed-noise textured frame + integer-shift second frame.

    PWC resizes inputs to /64 multiples (`pwcnet.py:234-244`), so unlike
    the RAFT gates a raw white-noise probe dies in the bilinear resize;
    band-limited texture (the same construction as the training set, but
    unseen instances) survives it. In-distribution for the shift-trained
    fixture: uniform translation, |t|<=24 px, at the training crop size
    (128x192)."""
    import cv2

    rng = np.random.RandomState(seed)
    base = rng.rand(h, w, 3).astype(np.float32)
    img1 = np.zeros_like(base)
    for sigma, gain in ((1.5, 1.0), (5.0, 2.0), (12.0, 4.0)):
        img1 += gain * cv2.GaussianBlur(base, (0, 0), sigma)
    img1 -= img1.min()
    img1 *= 255.0 / max(img1.max(), 1e-6)
    img2 = np.roll(np.roll(img1, dy, 0), dx, 1)
    m1 = ((rng.rand(h, w, 1) > 0.97) * 255).astype(np.float32)
    m2 = ((rng.rand(h, w, 1) > 0.97) * 255).astype(np.float32)
    return (img1[None], img2[None], m1[None], m2[None], (dx, dy))


def test_fixture_tree_matches_model():
    v = load_trained_variables()
    model = FFPWCNet(_cfg())
    i1, i2, m1, m2, _ = _textured_shift_pair()
    template = model.init(jax.random.PRNGKey(0),
                          *map(jnp.asarray, (i1, i2, m1, m2)))
    assert set(traverse_util.flatten_dict(template)) == set(
        traverse_util.flatten_dict(v))


def test_bf16_fast_path_trained():
    """bf16 compute vs f32, trained weights, full coarse-to-fine decode.

    Measured at export: f32 mean|flow| 0.75 px, bf16 |diff| mean 0.029 px,
    median 0.017 px — the bounds below have ~2x headroom."""
    v = load_trained_variables()
    i1, i2, m1, m2, _ = _textured_shift_pair(seed=6)
    args = list(map(jnp.asarray, (i1, i2, m1, m2)))
    f32 = np.asarray(FFPWCNet(_cfg()).apply(v, *args, test_mode=True))
    fast = np.asarray(FFPWCNet(_cfg(compute_dtype="bfloat16")).apply(
        v, *args, test_mode=True))
    diff = np.abs(fast - f32)
    mag = np.abs(f32).mean()
    assert float(diff.mean()) < 0.05 * max(float(mag), 1.0), (
        float(diff.mean()), float(mag))
    assert float(np.median(diff)) < 0.1


@requires_reference
def test_eval_protocol_same_weights_both_stacks_pwc(ref_pwc_modules):  # noqa: F811
    """AEPE + keypoint-EPE through our eval stack vs the reference protocol
    run in torch with the SAME trained weights (jax->torch exporter),
    matching `ff-pwcnet/evaluate.py:18-56`."""
    import argparse

    import torch

    from focusflow_official_tpu.compat.torch_import import (
        variables_to_torch_state_dict)
    from focusflow_official_tpu.train.evaluate import validate_chairs

    _, ref_ff_pwcnet = ref_pwc_modules
    v = load_trained_variables()
    model = FFPWCNet(_cfg())

    samples = []
    for s in range(3):
        i1, i2, m1, m2, (dx, dy) = _textured_shift_pair(seed=30 + s,
                                                        h=128, w=192)
        flow = np.zeros((128, 192, 2), np.float32)
        flow[..., 0], flow[..., 1] = dx, dy
        samples.append({"image1": i1[0], "image2": i2[0], "mask1": m1[0],
                        "mask2": m2[0], "flow": flow})

    class DS:
        def __len__(self):
            return len(samples)

        def __getitem__(self, i):
            return samples[i]

    ours = validate_chairs(model, v, DS(), iters=None)

    cfg = argparse.Namespace(
        MODEL=argparse.Namespace(FUSION="parallel", FUSION_TYPE="1x1conv"),
        TRAIN=argparse.Namespace(MASK_CHANNEL=3, MASK_MODAL="point",
                                 MASK_DILATE=31, KERNEL_SIZE=31,
                                 KERNEL_SIGMA=5),
    )
    tmodel = ref_ff_pwcnet.FF_PWCNET(cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(a))
          for k, a in variables_to_torch_state_dict(v).items()}
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    tmodel.eval()

    epes, mepes = [], []
    t = lambda x: torch.from_numpy(x[None].transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        for s in samples:
            pr = tmodel(t(s["image1"]), t(s["image2"]), t(s["mask1"]),
                        t(s["mask2"]), test_mode=True)
            pr = pr[0].numpy().transpose(1, 2, 0)
            epe = np.sqrt(((pr - s["flow"]) ** 2).sum(-1))
            epes.append(epe.reshape(-1))
            sel = s["mask1"][..., 0] > 0.5
            mepes.append(epe[sel].mean())
    torch_aepe = float(np.concatenate(epes).mean())
    torch_mepe = float(np.mean(mepes))

    assert abs(ours["chairs"] - torch_aepe) < 0.05 * max(torch_aepe, 1.0), (
        ours, torch_aepe)
    assert abs(ours["chairs-orb"] - torch_mepe) < 0.05 * max(torch_mepe, 1.0), (
        ours, torch_mepe)
