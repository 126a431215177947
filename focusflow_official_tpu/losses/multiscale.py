"""Multiscale (pyramid) loss family for PWC-Net: EPE, CPCL, Mix.

Functional equivalents of `/root/reference/core/models/ff-pwcnet/losses/
losses.py:19-260`, operating on the 5-level flow list (fine->coarse) that
FFPWCNet returns in train mode:

- per-level target downsampling by area interpolation (exact block mean —
  PWC levels always divide the /64-padded input);
- 'pretrain' mode -> L2 norm per pixel, otherwise robust (L1 + eps)^q;
- sparse (KITTI) targets downsampled by sparse max-pool (block max of
  positives + block min of negatives, `losses.py:44-56`), invalid = exactly
  (0, 0) flow;
- CPCL/Mix weight the per-level EPE map by the Gaussian-smeared keypoint
  mask (downsampled bilinear, half-pixel), normalized by mask mass;
- the 'epe' metric is the bilinearly-upsampled finest level vs full-res GT.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax.numpy as jnp

from ..ops.coords import resize_bilinear
from .sequence import smear_mask


def _block_mean(x: jnp.ndarray, hw) -> jnp.ndarray:
    """Area-interpolation downsample of (B, H, W, C) to (h, w) (integer factor)."""
    b, H, W, c = x.shape
    h, w = hw
    assert H % h == 0 and W % w == 0, (H, W, h, w)
    fy, fx = H // h, W // w
    return x.reshape(b, h, fy, w, fx, c).mean(axis=(2, 4))


def sparse_max_pool(x: jnp.ndarray, hw) -> jnp.ndarray:
    """Downsample treating 0 as invalid (`losses.py:44-56`), integer factors."""
    b, H, W, c = x.shape
    h, w = hw
    assert H % h == 0 and W % w == 0, (H, W, h, w)
    fy, fx = H // h, W // w
    xb = x.reshape(b, h, fy, w, fx, c)
    pos = jnp.maximum(xb, 0.0).max(axis=(2, 4))
    neg = jnp.maximum(-xb, 0.0).max(axis=(2, 4))
    return pos - neg


def _epe_map(pred, target, mode: str, q: float, eps: float) -> jnp.ndarray:
    """(B, H, W): L2 norm in 'pretrain' mode, robust (L1+eps)^q otherwise."""
    if mode == "pretrain":
        return jnp.sqrt(jnp.sum((target - pred) ** 2, axis=-1))
    return (jnp.sum(jnp.abs(target - pred), axis=-1) + eps) ** q


def _real_epe(finest, target, mode, q, eps, sparse):
    b, h, w, _ = target.shape
    up = resize_bilinear(finest, (h, w))
    m = _epe_map(up, target, mode, q, eps)
    if sparse:
        invalid = (target[..., 0] == 0) & (target[..., 1] == 0)
        valid = ~invalid
        return jnp.sum(m * valid) / jnp.maximum(valid.sum(), 1)
    return m.mean()


def multiscale_epe_loss(flow_preds: Sequence[jnp.ndarray], flow_gt, valid=None,
                        mask=None, *, weights: Sequence[float],
                        mode: str = "pretrain", q: float = 0.4, eps: float = 0.01,
                        sparse: bool = False):
    """EPELoss (`losses.py:19-86`). flow_preds fine->coarse NHWC."""
    assert len(weights) == len(flow_preds)
    loss = 0.0
    for pred, wgt in zip(flow_preds, weights):
        b, h, w, _ = pred.shape
        if sparse:
            target = sparse_max_pool(flow_gt, (h, w))
            m = _epe_map(pred, target, mode, q, eps)
            invalid = (target[..., 0] == 0) & (target[..., 1] == 0)
            loss += wgt * jnp.sum(m * (~invalid)) / b
        else:
            target = _block_mean(flow_gt, (h, w))
            m = _epe_map(pred, target, mode, q, eps)
            loss += wgt * m.sum() / b
    metrics = {"epe": _real_epe(flow_preds[0], flow_gt, mode, q, eps, sparse),
               "loss": loss}
    return loss, metrics


def multiscale_cpcl_loss(flow_preds, flow_gt, valid=None, mask=None, *,
                         weights, mode="pretrain", q=0.4, eps=0.01,
                         kernel_size=5, sigma=1.7, sparse: bool = False):
    """CPCL (`losses.py:89-164`): per-level EPE map weighted by the smeared
    keypoint mask (downsampled bilinear), normalized by mask mass x (h*w)."""
    assert len(weights) == len(flow_preds)
    loss = 0.0
    for pred, wgt in zip(flow_preds, weights):
        b, h, w, _ = pred.shape
        if sparse:
            target = sparse_max_pool(flow_gt, (h, w))
        else:
            target = _block_mean(flow_gt, (h, w))
        m = _epe_map(pred, target, mode, q, eps)
        mk = smear_mask(resize_bilinear(mask, (h, w)), kernel_size, sigma)[..., 0]
        weighted = m * mk
        if sparse:
            invalid = (target[..., 0] == 0) & (target[..., 1] == 0)
            weighted = weighted * (~invalid)
        loss += wgt * jnp.sum(weighted) / jnp.maximum(mk.sum(), 1e-12) * (h * w)
    metrics = {"epe": _real_epe(flow_preds[0], flow_gt, mode, q, eps, sparse),
               "loss": loss}
    return loss, metrics


def multiscale_mix_loss(flow_preds, flow_gt, valid=None, mask=None, *,
                        weights, mode="pretrain", q=0.4, eps=0.01,
                        kernel_size=5, sigma=1.7, lamda=0.8, sparse: bool = False):
    """MixLoss (`losses.py:167-260`): per level, epe.sum() + lamda *
    (mask-weighted epe)/mask_mass * (h*w). Empty masks contribute zero
    (the reference's mask.sum()==0 guard)."""
    assert len(weights) == len(flow_preds)
    loss = 0.0
    for pred, wgt in zip(flow_preds, weights):
        b, h, w, _ = pred.shape
        if sparse:
            target = sparse_max_pool(flow_gt, (h, w))
        else:
            target = _block_mean(flow_gt, (h, w))
        m = _epe_map(pred, target, mode, q, eps)

        mk_small = resize_bilinear(mask, (h, w))
        mk = smear_mask(mk_small, kernel_size, sigma)[..., 0]
        weighted = m * mk
        if sparse:
            invalid = (target[..., 0] == 0) & (target[..., 1] == 0)
            weighted = weighted * (~invalid)
        mask_sum = mk.sum()
        mask_term = jnp.where(
            mask_sum > 0,
            jnp.sum(weighted) / jnp.maximum(mask_sum, 1e-12) * (h * w),
            0.0,
        )
        # NOTE: the dense term intentionally includes invalid pixels, as in
        # the reference (`losses.py:209`).
        loss += wgt * (m.sum() + lamda * mask_term)
    metrics = {"epe": _real_epe(flow_preds[0], flow_gt, mode, q, eps, sparse),
               "loss": loss}
    return loss, metrics


def build_multiscale_loss(loss_type: str, *, weights, mode="pretrain", q=0.4,
                          eps=0.01, kernel_size=5, sigma=1.7, lamda=0.8,
                          sparse: bool = False):
    """Factory mirroring `ff-pwcnet/losses/__init__.py:3-12`."""
    if loss_type == "EPELoss":
        return functools.partial(multiscale_epe_loss, weights=weights, mode=mode,
                                 q=q, eps=eps, sparse=sparse)
    if loss_type == "CPCL":
        return functools.partial(multiscale_cpcl_loss, weights=weights, mode=mode,
                                 q=q, eps=eps, kernel_size=kernel_size, sigma=sigma,
                                 sparse=sparse)
    if loss_type == "MixLoss":
        return functools.partial(multiscale_mix_loss, weights=weights, mode=mode,
                                 q=q, eps=eps, kernel_size=kernel_size, sigma=sigma,
                                 lamda=lamda, sparse=sparse)
    raise ValueError(f'"loss_type":"{loss_type}" is not supported.')
