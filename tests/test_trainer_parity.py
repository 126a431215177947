"""Trainer-parity gate (SURVEY.md §7.4 gate 4): loss-curve overlap.

Trains FF-RAFT for 60 steps on a fixed synthetic batch cycle with IDENTICAL
weights (torch init imported into flax) and identical data on both sides —
the torch reference stack (model + MixLoss + AdamW + OneCycleLR + global
clip, `ff-raft/train.py:211-263,291-328`) vs our jit'd train step — and
asserts the per-step losses track. This validates the optimizer, schedule,
clip, loss wiring, and BN-stat updates end-to-end, not just single pieces.

fp32, no noise aug, batch 1 (DDP world_size=1 so the reference's
`loss *= world_size` is a no-op).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import requires_reference
from focusflow_official_tpu.compat import torch_state_dict_to_variables
from focusflow_official_tpu.losses import build_sequence_loss
from focusflow_official_tpu.models import FFRaft, FFRaftConfig
from focusflow_official_tpu.train.loop import (
    build_optimizer,
    create_train_state,
    make_train_step,
)
from focusflow_official_tpu.train.schedule import one_cycle_lr

pytestmark = pytest.mark.slow  # multi-minute suite; -m 'not slow' skips

STEPS = 50
ITERS = 2
H, W = 128, 160  # reference NaNs below 128 px (1x1 corr-pyramid level)
LR, WD, EPS, CLIP = 4e-4, 1e-5, 1e-8, 1.0


def _batches(n=4, b=1):
    rng = np.random.RandomState(17)
    out = []
    for _ in range(n):
        out.append({
            "image1": (rng.rand(b, H, W, 3) * 255).astype(np.float32),
            "image2": (rng.rand(b, H, W, 3) * 255).astype(np.float32),
            "mask1": ((rng.rand(b, H, W, 1) > 0.98) * 255).astype(np.float32),
            "mask2": ((rng.rand(b, H, W, 1) > 0.98) * 255).astype(np.float32),
            "flow": (rng.randn(b, H, W, 2) * 3).astype(np.float32),
            "valid": np.ones((b, H, W), np.float32),
        })
    return out


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _ref_cfg():
    import argparse

    return argparse.Namespace(
        MODEL=argparse.Namespace(FUSION_TYPE="1x1conv", LOAD_MODULE_TO_BRANCH=False),
        TRAIN=argparse.Namespace(
            MASK_CHANNEL=3, MASK_MODAL="point", MASK_DILATE=31,
            KERNEL_SIZE=31, KERNEL_SIGMA=5,
        ),
    )


def _torch_losses(ref_ffraft_modules, batches):
    _, ref_ff_raft, ref_losses = ref_ffraft_modules
    torch.manual_seed(7)
    model = ref_ff_raft.FF_RAFT_FUSION(
        use_fusion="parallel", fusion_channels=256, raft_small=False,
        fuse_cnet=True, cfg=_ref_cfg(),
    )
    model.train()
    import copy

    init_sd = copy.deepcopy(model.state_dict())  # pre-training weights
    loss_fn = ref_losses.MixLoss(gamma=0.8, max_flow=400, kernel_size=1,
                                 sigma=0.01, lamda=1.0)
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD, eps=EPS)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, LR, STEPS + 100, pct_start=0.05, cycle_momentum=False,
        anneal_strategy="linear")
    losses = []
    for step in range(STEPS):
        bt = batches[step % len(batches)]
        preds = model(_nchw(bt["image1"]), _nchw(bt["image2"]),
                      _nchw(bt["mask1"]), _nchw(bt["mask2"]), raft_iters=ITERS)
        flow = _nchw(bt["flow"])
        valid = torch.from_numpy(bt["valid"].copy())
        loss, _ = loss_fn(preds, flow, valid, _nchw(bt["mask1"]))
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
        sched.step()
        losses.append(float(loss.detach()))
    return losses, init_sd


@requires_reference
def test_loss_curve_overlap(ref_ffraft_modules):
    batches = _batches()
    want, init_sd = _torch_losses(ref_ffraft_modules, batches)

    cfg = FFRaftConfig(fusion="parallel", fusion_type="1x1conv", fuse_cnet=True,
                       iters=ITERS, compute_dtype="float32", corr_impl="xla")
    model = FFRaft(cfg)
    tx = build_optimizer(one_cycle_lr(LR, STEPS + 100, pct_start=0.05),
                         weight_decay=WD, epsilon=EPS, clip=CLIP)
    example = {k: jnp.asarray(v) for k, v in batches[0].items()}
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)

    imported = torch_state_dict_to_variables(
        init_sd,
        {"params": state.params, "batch_stats": state.batch_stats},
        strict=True,
    )
    state = state.replace(params=imported["params"],
                          batch_stats=imported["batch_stats"])

    loss_fn = build_sequence_loss("MixLoss", gamma=0.8, max_flow=400,
                                  kernel_size=1, sigma=0.01, lamda=1.0)
    step_fn = make_train_step(loss_fn, iters=ITERS, add_noise=False)

    got = []
    rng = jax.random.PRNGKey(0)
    for step in range(STEPS):
        bt = {k: jnp.asarray(v) for k, v in batches[step % len(batches)].items()}
        state, metrics = step_fn(state, bt, rng)
        got.append(float(metrics["loss"]))

    got = np.asarray(got)
    want = np.asarray(want)
    rel = np.abs(got - want) / want
    print("per-step relative loss deviation:", rel)
    # Identical math, different backends: per-step float drift (~1e-6)
    # compounds exponentially through the weights because the global-norm
    # clip rescales every update by ~1/180 of a noisy norm. Measured drift:
    # ~2e-6 at step 0, ~1e-3 by step 8, ~2e-3 by step 11. The gate checks
    # (a) exact wiring over the first steps, (b) tight tracking over the
    # first quarter, (c) the curves stay glued on average over all 50.
    # The first-steps bound was recalibrated 1e-4 -> 5e-4 after the round-3
    # layout work reordered f32 reductions (FMA convex upsample, chunked
    # lookup einsum output order); forward outputs stay exact vs torch
    # (test_model_parity) and the chunk-lookup gradients match the XLA
    # gather reference to 3e-7 — the drift is summation-order noise, not
    # wiring (step-0 deviation stays ~2e-6).
    assert rel[0] < 1e-5, rel[0]
    assert rel[:5].max() < 5e-4, rel[:5]
    assert rel[:25].max() < 2e-2, rel[:25].max()
    assert rel.mean() < 2e-2, rel.mean()
    assert abs(got[-1] - want[-1]) / want[-1] < 0.1
