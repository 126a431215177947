"""FF-PWCNet parity vs the torch reference (CPU).

The reference's cost volume is a CUDA/CuPy kernel and its backwarp calls
`.cuda()`, so neither runs on this CPU box. The test injects CPU stand-ins
with identical math (the naive formulation the CUDA kernel computes, and
the same grid_sample call minus `.cuda()`) before importing the reference —
`ops/local_corr.py` and `ops/warp.py` are separately validated against that
math in `test_ops.py` / here.
"""

import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, requires_reference
from focusflow_official_tpu.compat import torch_state_dict_to_variables
from focusflow_official_tpu.models import FFPWCNet, FFRaftConfig, PWCNet
from focusflow_official_tpu.ops.warp import backwarp as our_backwarp

RNG = np.random.RandomState(21)


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _torch_local_corr(ten_one, ten_two, radius=4):
    """The math of kernel_Correlation_updateOutput
    (`ff-pwcnet/PWCNet_Core/correlation.py:34-101`), in torch (CPU)."""
    b, c, h, w = ten_one.shape
    r = radius
    f2p = F.pad(ten_two, (r, r, r, r))
    outs = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = f2p[:, :, r + dy : r + dy + h, r + dx : r + dx + w]
            outs.append((ten_one * shifted).mean(1))
    return torch.stack(outs, dim=1)


def _cpu_backwarp(tenInput=None, tenFlow=None):
    """Reference backwarp (`pwcnet.py:19-39`) without the `.cuda()` calls."""
    ten_input, ten_flow = tenInput, tenFlow
    b, _, h, w = ten_flow.shape
    hor = torch.linspace(-1.0 + 1.0 / w, 1.0 - 1.0 / w, w).view(1, 1, 1, -1).repeat(1, 1, h, 1)
    ver = torch.linspace(-1.0 + 1.0 / h, 1.0 - 1.0 / h, h).view(1, 1, -1, 1).repeat(1, 1, 1, w)
    grid = torch.cat([hor, ver], 1)
    partial = ten_flow.new_ones([b, 1, h, w])
    flow = torch.cat([
        ten_flow[:, 0:1] / ((ten_input.shape[3] - 1.0) / 2.0),
        ten_flow[:, 1:2] / ((ten_input.shape[2] - 1.0) / 2.0),
    ], 1)
    inp = torch.cat([ten_input, partial], 1)
    out = F.grid_sample(inp, (grid + flow).permute(0, 2, 3, 1), mode="bilinear",
                        padding_mode="zeros", align_corners=False)
    mask = out[:, -1:]
    mask = (mask > 0.999).float()
    return out[:, :-1] * mask


@pytest.fixture(scope="session")
def ref_pwc_modules():
    """Import the reference FF-PWC core with CPU stand-ins injected."""
    pwc_path = f"{REFERENCE_ROOT}/core/models/ff-pwcnet"
    if pwc_path not in sys.path:
        sys.path.insert(0, pwc_path)

    fake_fn = types.SimpleNamespace(
        FunctionCorrelation=lambda tenOne, tenTwo: _torch_local_corr(tenOne, tenTwo),
        ModuleCorrelation=None,
    )
    fake_pkg = types.ModuleType("correlation")
    fake_pkg.correlation = fake_fn
    sys.modules["correlation"] = fake_pkg
    sys.modules["correlation.correlation"] = fake_fn

    import PWCNet_Core.pwcnet as ref_pwcnet
    import PWCNet_Core.ff_pwcnet as ref_ff_pwcnet

    ref_pwcnet.backwarp = _cpu_backwarp
    ref_ff_pwcnet.backwarp = _cpu_backwarp
    return ref_pwcnet, ref_ff_pwcnet


def test_backwarp_parity():
    img = RNG.randn(2, 3, 14, 18).astype(np.float32)
    flow = (RNG.randn(2, 2, 14, 18) * 3).astype(np.float32)
    want = _cpu_backwarp(torch.from_numpy(img), torch.from_numpy(flow)).numpy()
    got = our_backwarp(jnp.asarray(to_nhwc(img)), jnp.asarray(to_nhwc(flow)))
    np.testing.assert_allclose(to_nchw(np.asarray(got)), want, atol=1e-5)


def test_backwarp_flow_gradient_parity():
    """d(loss)/d(flow) through the warp vs torch autograd through the
    reference backwarp. PWC training optimizes the flow estimate THROUGH
    the warp's sampling coordinates — a path no RAFT-family test
    differentiates (RAFT's lookup consumes flow via the corr volume
    instead), so forward parity alone would not catch a wrong or
    stopped coordinate gradient."""
    img = RNG.randn(2, 4, 13, 17).astype(np.float32)
    flow = (RNG.randn(2, 2, 13, 17) * 1.5).astype(np.float32)
    cot = RNG.randn(2, 4, 13, 17).astype(np.float32)

    g_nhwc = jnp.asarray(to_nhwc(cot))
    f = lambda fl: (our_backwarp(jnp.asarray(to_nhwc(img)), fl) * g_nhwc).sum()
    ours = np.asarray(jax.grad(f)(jnp.asarray(to_nhwc(flow))))

    tflow = torch.from_numpy(flow).requires_grad_(True)
    loss = (_cpu_backwarp(torch.from_numpy(img), tflow)
            * torch.from_numpy(cot)).sum()
    loss.backward()
    want = tflow.grad.numpy()
    np.testing.assert_allclose(to_nchw(ours), want, atol=5e-5)


@requires_reference
def test_vanilla_pwcnet_parity(ref_pwc_modules):
    ref_pwcnet, _ = ref_pwc_modules
    torch.manual_seed(3)
    ref = ref_pwcnet.PWCNET()
    ref.eval()

    img1 = (RNG.rand(1, 3, 128, 192) * 255).astype(np.float32)
    img2 = (RNG.rand(1, 3, 128, 192) * 255).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(img1), torch.from_numpy(img2), test_mode=True).numpy()

    ours = PWCNet()
    args = [jnp.asarray(to_nhwc(x)) for x in (img1, img2)]
    template = ours.init(jax.random.PRNGKey(0), *args)
    variables = torch_state_dict_to_variables(ref.state_dict(), template)
    variables = jax.tree.map(jnp.asarray, variables)
    got = ours.apply(variables, *args, test_mode=True)
    np.testing.assert_allclose(to_nchw(np.asarray(got)), want, atol=1e-2, rtol=1e-4)


@requires_reference
def test_ff_pwcnet_parity(ref_pwc_modules):
    import argparse

    _, ref_ff_pwcnet = ref_pwc_modules
    cfg = argparse.Namespace(
        MODEL=argparse.Namespace(FUSION="parallel", FUSION_TYPE="1x1conv"),
        TRAIN=argparse.Namespace(MASK_CHANNEL=3, MASK_MODAL="point", MASK_DILATE=31,
                                 KERNEL_SIZE=31, KERNEL_SIGMA=5),
    )
    torch.manual_seed(4)
    ref = ref_ff_pwcnet.FF_PWCNET(cfg)
    ref.eval()

    img1 = (RNG.rand(1, 3, 128, 192) * 255).astype(np.float32)
    img2 = (RNG.rand(1, 3, 128, 192) * 255).astype(np.float32)
    mask1 = (RNG.rand(1, 1, 128, 192) > 0.95).astype(np.float32) * 255
    mask2 = (RNG.rand(1, 1, 128, 192) > 0.95).astype(np.float32) * 255
    with torch.no_grad():
        want = ref(*[torch.from_numpy(x) for x in (img1, img2, mask1, mask2)],
                   test_mode=True).numpy()

    ours = FFPWCNet(FFRaftConfig(fusion="parallel", fusion_type="1x1conv"))
    args = [jnp.asarray(to_nhwc(x)) for x in (img1, img2, mask1, mask2)]
    template = ours.init(jax.random.PRNGKey(0), *args)
    variables = torch_state_dict_to_variables(ref.state_dict(), template)
    variables = jax.tree.map(jnp.asarray, variables)
    got = ours.apply(variables, *args, test_mode=True)
    np.testing.assert_allclose(to_nchw(np.asarray(got)), want, atol=1e-2, rtol=1e-4)


@requires_reference
@pytest.mark.parametrize("loss_type,sparse,mode", [
    ("EPELoss", False, "pretrain"),
    ("EPELoss", False, "robust"),
    ("EPELoss", True, "pretrain"),
    ("MixLoss", False, "pretrain"),
    ("MixLoss", True, "robust"),
])
def test_multiscale_loss_parity(loss_type, sparse, mode):
    import argparse
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_pwc_losses", f"{REFERENCE_ROOT}/core/models/ff-pwcnet/losses/losses.py"
    )
    ref_losses = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_losses)

    weights = [0.005, 0.01, 0.02, 0.08, 0.32]
    cfg = argparse.Namespace(TRAIN=argparse.Namespace(
        LOSS_MODE=mode, LOSS_WEIGHTS=weights, LOSS_Q=0.4, LOSS_EPSILON=0.01,
        LOSS_KERNEL_SIZE=5, LOSS_SIGMA=1.7, LOSS_LAMDA=0.8,
    ))
    ref_fn = {"EPELoss": ref_losses.EPELoss, "MixLoss": ref_losses.MixLoss}[loss_type](cfg)

    h, w = 64, 128  # /64-multiple so PWC level shapes divide
    gt = (RNG.randn(2, 2, h, w) * 4).astype(np.float32)
    if sparse:
        gt = gt * (RNG.rand(2, 1, h, w) > 0.6)  # zeros = invalid
    preds = [
        (RNG.randn(2, 2, h // s, w // s)).astype(np.float32)
        for s in (4, 8, 16, 32, 64)
    ]
    mask = ((RNG.rand(2, 1, h, w) > 0.9) * 255).astype(np.float32)

    t_preds = [torch.from_numpy(p) for p in preds]
    if loss_type == "EPELoss":
        ref_loss, ref_metrics = ref_fn(t_preds, torch.from_numpy(gt), sparse)
    else:
        ref_loss, ref_metrics = ref_fn(t_preds, torch.from_numpy(gt),
                                       torch.from_numpy(mask), sparse)

    from focusflow_official_tpu.losses import build_multiscale_loss

    ours_fn = build_multiscale_loss(
        loss_type, weights=weights, mode=mode, q=0.4, eps=0.01,
        kernel_size=5, sigma=1.7, lamda=0.8, sparse=sparse,
    )
    loss, metrics = ours_fn(
        [jnp.asarray(to_nhwc(p)) for p in preds],
        jnp.asarray(to_nhwc(gt)),
        None,
        jnp.asarray(to_nhwc(mask)),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4)
    np.testing.assert_allclose(float(metrics["epe"]), float(ref_metrics["epe"]), rtol=2e-4)
