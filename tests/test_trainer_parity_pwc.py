"""PWC trainer-parity gate: loss-curve overlap vs the torch reference.

The FF-PWCNet analog of `test_trainer_parity.py` (SURVEY.md §7.4 gate 4):
40 optimization steps on a fixed synthetic batch cycle with IDENTICAL
weights (torch init imported into flax) and identical data on both sides —
the torch reference stack (FF_PWCNET + multiscale MixLoss + AdamW +
OneCycleLR + global clip, `ff-pwcnet/train.py:211-328`) vs our jit'd train
step. This is the direct evidence that the PWC family's training dynamics
ARE the reference's: whatever the reference would learn on a schedule, we
learn identically (the trained-gate fixture's convergence behavior is then
an architecture property, not a port bug — see BENCH.md trained gates).

fp32, no noise aug, batch 1 (DDP world_size=1 so `loss *= world_size`,
`ff-pwcnet/train.py:312-314`, is a no-op).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import requires_reference
from focusflow_official_tpu.compat import torch_state_dict_to_variables
from focusflow_official_tpu.losses import build_multiscale_loss
from focusflow_official_tpu.models import FFPWCNet, FFRaftConfig
from focusflow_official_tpu.train.loop import (
    build_optimizer,
    create_train_state,
    make_train_step,
)
from focusflow_official_tpu.train.schedule import one_cycle_lr
from test_pwc_parity import ref_pwc_modules  # noqa: F401  (session fixture)

pytestmark = pytest.mark.slow  # multi-minute suite; -m 'not slow' skips

STEPS = 40
H, W = 64, 128  # /64 multiples: PWC resizes inputs to /64 (`pwcnet.py:234-244`)
LR, WD, EPS, CLIP = 4e-4, 1e-5, 1e-8, 1.0
WEIGHTS = [0.005, 0.01, 0.02, 0.08, 0.32]


def _batches(n=4, b=1):
    rng = np.random.RandomState(23)
    out = []
    for _ in range(n):
        out.append({
            "image1": (rng.rand(b, H, W, 3) * 255).astype(np.float32),
            "image2": (rng.rand(b, H, W, 3) * 255).astype(np.float32),
            "mask1": ((rng.rand(b, H, W, 1) > 0.97) * 255).astype(np.float32),
            "mask2": ((rng.rand(b, H, W, 1) > 0.97) * 255).astype(np.float32),
            "flow": (rng.randn(b, H, W, 2) * 4).astype(np.float32),
            "valid": np.ones((b, H, W), np.float32),
        })
    return out


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _ref_cfg():
    import argparse

    return argparse.Namespace(
        MODEL=argparse.Namespace(FUSION="parallel", FUSION_TYPE="1x1conv"),
        TRAIN=argparse.Namespace(
            MASK_CHANNEL=3, MASK_MODAL="point", MASK_DILATE=31,
            KERNEL_SIZE=31, KERNEL_SIGMA=5,
            LOSS_MODE="pretrain", LOSS_WEIGHTS=WEIGHTS, LOSS_Q=0.4,
            LOSS_EPSILON=0.01, LOSS_KERNEL_SIZE=1, LOSS_SIGMA=0.01,
            LOSS_LAMDA=1.0,
        ),
    )


def _torch_losses(ref_pwc_modules, batches):  # noqa: F811
    import copy
    import importlib.util

    from conftest import REFERENCE_ROOT

    _, ref_ff_pwcnet = ref_pwc_modules
    spec = importlib.util.spec_from_file_location(
        "ref_pwc_losses_tp",
        f"{REFERENCE_ROOT}/core/models/ff-pwcnet/losses/losses.py")
    ref_losses = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_losses)

    torch.manual_seed(11)
    model = ref_ff_pwcnet.FF_PWCNET(_ref_cfg())
    model.train()
    init_sd = copy.deepcopy(model.state_dict())
    loss_fn = ref_losses.MixLoss(_ref_cfg())
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD, eps=EPS)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, LR, STEPS + 100, pct_start=0.05, cycle_momentum=False,
        anneal_strategy="linear")
    losses = []
    for step in range(STEPS):
        bt = batches[step % len(batches)]
        preds = model(_nchw(bt["image1"]), _nchw(bt["image2"]),
                      _nchw(bt["mask1"]), _nchw(bt["mask2"]), test_mode=False)
        loss, _ = loss_fn(preds, _nchw(bt["flow"]), _nchw(bt["mask1"]), False)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
        sched.step()
        losses.append(float(loss.detach()))
    return losses, init_sd


@requires_reference
def test_pwc_loss_curve_overlap(ref_pwc_modules):  # noqa: F811
    batches = _batches()
    want, init_sd = _torch_losses(ref_pwc_modules, batches)

    cfg = FFRaftConfig(fusion="parallel", fusion_type="1x1conv",
                       compute_dtype="float32", corr_impl="xla")
    model = FFPWCNet(cfg)
    tx = build_optimizer(one_cycle_lr(LR, STEPS + 100, pct_start=0.05),
                         weight_decay=WD, epsilon=EPS, clip=CLIP)
    example = {k: jnp.asarray(v) for k, v in batches[0].items()}
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)

    imported = torch_state_dict_to_variables(
        init_sd, {"params": state.params}, strict=True)
    state = state.replace(params=imported["params"])

    loss_fn = build_multiscale_loss("MixLoss", weights=WEIGHTS,
                                    mode="pretrain", q=0.4, eps=0.01,
                                    kernel_size=1, sigma=0.01, lamda=1.0,
                                    sparse=False)
    step_fn = make_train_step(loss_fn, iters=None, add_noise=False)

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
    # Same gate shape as the RAFT trainer-parity test: exact wiring at step
    # 0, tight tracking early, glued on average (per-step float drift
    # compounds through the global-norm clip; see test_trainer_parity.py).
    assert rel[0] < 1e-5, rel[0]
    assert rel[:5].max() < 5e-4, rel[:5]
    assert rel[:20].max() < 2e-2, rel[:20].max()
    assert rel.mean() < 2e-2, rel.mean()
    assert abs(got[-1] - want[-1]) / want[-1] < 0.1
