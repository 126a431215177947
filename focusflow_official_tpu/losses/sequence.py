"""Sequence-weighted loss family: EPE, CPCL, and Mix (RAFT / FlowFormer).

Functional equivalents of the reference losses
(`/root/reference/core/models/ff-raft/losses/losses.py:18-130`), operating on
a stacked (N_pred, B, H, W, 2) flow sequence (the `lax.scan` output) instead
of a Python list — the gamma-discounted sum is a single weighted reduction.

CPCL (Conditional Point Control Loss) weights the per-pixel L1 by the
Gaussian-smeared keypoint mask and normalizes by the mask mass
(`losses.py:69-78`); Mix = EPE + lambda * CPCL.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mask_modal import gaussian_kernel


def _valid_mask(flow_gt: jnp.ndarray, valid: jnp.ndarray, max_flow: float) -> jnp.ndarray:
    """(B, H, W) bool: valid pixels with |gt| below max_flow (`losses.py:31-32`)."""
    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    return (valid >= 0.5) & (mag < max_flow)


def _seq_weights(n: int, gamma: float) -> jnp.ndarray:
    return jnp.asarray([gamma ** (n - i - 1) for i in range(n)], jnp.float32)


def _final_epe(flow_preds, flow_gt, valid):
    epe = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.sum(epe * valid) / denom


def smear_mask(mask: jnp.ndarray, kernel_size: int, sigma: float) -> jnp.ndarray:
    """Binarize then Gaussian-smear the keypoint mask (`losses.py:69-74`).

    mask: (B, H, W, 1) raw 0/255. VALID (no-pad-then-crop) conv like the
    reference's explicit F.pad + F.conv2d keeps the border semantics.
    """
    m = (mask > 0).astype(jnp.float32)
    k = np.asarray(gaussian_kernel(kernel_size, sigma))[:, :, None, None]
    pad = kernel_size // 2
    return jax.lax.conv_general_dilated(
        m, jnp.asarray(k), (1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def epe_loss(flow_preds, flow_gt, valid, mask=None, *, gamma=0.8, max_flow=400.0):
    """Gamma-discounted sequence L1 (`EPELoss`, `losses.py:18-47`).

    flow_preds: (N, B, H, W, 2); flow_gt: (B, H, W, 2); valid: (B, H, W).
    Returns (loss, metrics).
    """
    n = flow_preds.shape[0]
    v = _valid_mask(flow_gt, valid, max_flow)
    w = _seq_weights(n, gamma)

    diff = jnp.abs(flow_preds - flow_gt[None])  # (N, B, H, W, 2)
    per_pred = jnp.mean(v[None, ..., None] * diff, axis=(1, 2, 3, 4))  # (N,)
    loss = jnp.sum(w * per_pred)

    metrics = {"epe": _final_epe(flow_preds, flow_gt, v), "loss": loss}
    return loss, metrics


def cpcl_loss(flow_preds, flow_gt, valid, mask, *, gamma=0.8, max_flow=400.0,
              kernel_size=5, sigma=1.7):
    """Conditional Point Control Loss (`CPCL`, `losses.py:50-88`)."""
    n = flow_preds.shape[0]
    v = _valid_mask(flow_gt, valid, max_flow)
    w = _seq_weights(n, gamma)
    m = smear_mask(mask, kernel_size, sigma)  # (B, H, W, 1)

    diff = jnp.abs(flow_preds - flow_gt[None])
    weighted = v[None, ..., None] * m[None] * diff
    per_pred = jnp.sum(weighted, axis=(1, 2, 3, 4)) / jnp.maximum(m.sum(), 1e-12)
    loss = jnp.sum(w * per_pred)

    metrics = {"epe": _final_epe(flow_preds, flow_gt, v), "loss": loss}
    return loss, metrics


def mix_loss(flow_preds, flow_gt, valid, mask, *, gamma=0.8, max_flow=400.0,
             kernel_size=5, sigma=1.7, lamda=0.8):
    """EPE + lambda * CPCL (`MixLoss`, `losses.py:91-130`)."""
    n = flow_preds.shape[0]
    v = _valid_mask(flow_gt, valid, max_flow)
    w = _seq_weights(n, gamma)
    m = smear_mask(mask, kernel_size, sigma)

    diff = jnp.abs(flow_preds - flow_gt[None])
    vdiff = v[None, ..., None] * diff
    cpcl_per = jnp.sum(m[None] * vdiff, axis=(1, 2, 3, 4)) / jnp.maximum(m.sum(), 1e-12)
    epe_per = jnp.mean(vdiff, axis=(1, 2, 3, 4))
    loss = jnp.sum(w * (lamda * cpcl_per + epe_per))

    metrics = {"epe": _final_epe(flow_preds, flow_gt, v), "loss": loss}
    return loss, metrics


def build_sequence_loss(loss_type: str, *, gamma=0.8, max_flow=400.0,
                        kernel_size=5, sigma=1.7, lamda=0.8):
    """Factory mirroring `build_losses` (`losses/__init__.py:3-11`)."""
    if loss_type == "EPELoss":
        return functools.partial(epe_loss, gamma=gamma, max_flow=max_flow)
    if loss_type == "CPCL":
        return functools.partial(cpcl_loss, gamma=gamma, max_flow=max_flow,
                                 kernel_size=kernel_size, sigma=sigma)
    if loss_type == "MixLoss":
        return functools.partial(mix_loss, gamma=gamma, max_flow=max_flow,
                                 kernel_size=kernel_size, sigma=sigma, lamda=lamda)
    raise ValueError(f'"loss_type":"{loss_type}" is not supported.')
