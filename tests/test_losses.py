"""Parity tests for the sequence loss family vs the reference torch losses."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conftest import requires_reference
from focusflow_official_tpu.losses import build_sequence_loss

RNG = np.random.RandomState(3)


def _make_data(n_preds=4, b=2, h=16, w=20):
    preds = RNG.randn(n_preds, b, 2, h, w).astype(np.float32) * 3
    gt = RNG.randn(b, 2, h, w).astype(np.float32) * 3
    # a few pixels invalid, a few over max_flow (via large gt)
    gt[0, :, 0, 0] = 500.0
    valid = (RNG.rand(b, h, w) > 0.1).astype(np.float32)
    mask = ((RNG.rand(b, 1, h, w) > 0.9).astype(np.float32)) * 255
    return preds, gt, valid, mask


@requires_reference
@pytest.mark.parametrize("loss_type,kwargs", [
    ("EPELoss", {}),
    ("CPCL", dict(kernel_size=5, sigma=1.7)),
    ("MixLoss", dict(kernel_size=5, sigma=1.7, lamda=0.8)),
    ("MixLoss", dict(kernel_size=1, sigma=0.01, lamda=1.0)),  # experiment configs
])
def test_sequence_loss_parity(ref_ffraft_modules, loss_type, kwargs):
    _, _, ref_losses = ref_ffraft_modules
    preds, gt, valid, mask = _make_data()

    ref_cls = {"EPELoss": ref_losses.EPELoss, "CPCL": ref_losses.CPCL,
               "MixLoss": ref_losses.MixLoss}[loss_type]
    ref_fn = ref_cls(gamma=0.8, max_flow=400, **kwargs)
    t_preds = [torch.from_numpy(p) for p in preds]
    ref_loss, ref_metrics = ref_fn(
        t_preds, torch.from_numpy(gt), torch.from_numpy(valid), torch.from_numpy(mask)
    )

    ours_fn = build_sequence_loss(loss_type, gamma=0.8, max_flow=400, **kwargs)
    loss, metrics = ours_fn(
        jnp.asarray(np.transpose(preds, (0, 1, 3, 4, 2))),
        jnp.asarray(np.transpose(gt, (0, 2, 3, 1))),
        jnp.asarray(valid),
        jnp.asarray(np.transpose(mask, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    np.testing.assert_allclose(float(metrics["epe"]), ref_metrics["epe"], rtol=1e-4)
