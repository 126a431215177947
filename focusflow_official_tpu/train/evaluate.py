"""Validation protocol: chairs / Sintel / KITTI (AEPE, keypoint-EPE, F1).

The exact reference protocol (`/root/reference/core/models/ff-raft/
evaluate.py:18-134`): chairs at 12 iters b=1; Sintel clean+final at 32
iters with sintel-mode pad-to-/8; KITTI at 32 iters with kitti padding,
F1 = %((epe>3) & (epe/mag>0.05)); keypoint-EPE over `mask1 > 0.5` pixels
(the raw 0/255 mask, replicate-padded then un-padded with the flow).

TPU-shaped: each dataset is evaluated through ONE jit'd forward at a fixed
padded size (bucketed), with per-image metric reductions on device.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.padding import InputPadder


def _epe_map(flow, flow_gt):
    return jnp.sqrt(jnp.sum((flow - flow_gt) ** 2, axis=-1))


def make_eval_forward(model, variables, iters: int):
    """jit'd (image1, image2, mask1, mask2) -> upsampled flow (NHWC).

    Normalizes the families' test-mode returns: RAFT -> (lowres, up),
    FlowFormer -> (up, lowres), PWC -> up.
    """

    @functools.partial(jax.jit, static_argnames=())
    def forward(image1, image2, mask1, mask2):
        out = model.apply(
            variables, image1, image2, mask1, mask2, iters=iters, test_mode=True
        )
        if isinstance(out, (tuple, list)):
            full = [o for o in out if o.shape[1:3] == image1.shape[1:3]]
            return full[0]
        return out

    return forward


def validate_chairs(model, variables, dataset, mask_type: str = "orb",
                    iters: int = 12, progress: Optional[Callable] = None) -> Dict:
    forward = make_eval_forward(model, variables, iters)
    aepe_all, mepe_list = [], []
    for i in range(len(dataset)):
        s = dataset[i]
        args = [jnp.asarray(s[k][None]) for k in ("image1", "image2", "mask1", "mask2")]
        flow = forward(*args)
        aepe = np.asarray(_epe_map(flow[0], jnp.asarray(s["flow"])))
        aepe_all.append(aepe.ravel())
        sel = s["mask1"][..., 0] > 0.5
        if sel.any():
            mepe_list.append(aepe[sel].mean())
        if progress:
            progress(i, len(dataset))
    return {
        "chairs": float(np.mean(np.concatenate(aepe_all))),
        f"chairs-{mask_type}": float(np.mean(mepe_list)),
    }


def validate_sintel(model, variables, datasets: Dict[str, object],
                    mask_type: str = "orb", iters: int = 32,
                    progress: Optional[Callable] = None) -> Dict:
    """datasets: {'clean': MpiSintel(...), 'final': MpiSintel(...)} val splits."""
    results = {}
    for dstype, dataset in datasets.items():
        forward = None
        aepe_all, mepe_list = [], []
        for i in range(len(dataset)):
            s = dataset[i]
            padder = InputPadder(s["image1"][None].shape)
            img1, img2, m1, m2 = padder.pad(
                *[jnp.asarray(s[k][None]) for k in ("image1", "image2", "mask1", "mask2")]
            )
            if forward is None:
                fwd = make_eval_forward(model, variables, iters)
                forward = fwd
            flow = padder.unpad(forward(img1, img2, m1, m2))
            mask1 = np.asarray(padder.unpad(m1))[0]
            aepe = np.asarray(_epe_map(flow[0], jnp.asarray(s["flow"])))
            aepe_all.append(aepe.ravel())
            sel = mask1[..., 0] > 0.5
            if sel.any():
                mepe_list.append(aepe[sel].mean())
            if progress:
                progress(i, len(dataset))
        results[f"sintel-{dstype}"] = float(np.mean(np.concatenate(aepe_all)))
        results[f"sintel-{dstype}-{mask_type}"] = float(np.mean(mepe_list))
    return results


def validate_kitti(model, variables, dataset, mask_type: str = "orb",
                   iters: int = 32, progress: Optional[Callable] = None) -> Dict:
    forward = None
    out_list, aepe_list, mepe_list = [], [], []
    for i in range(len(dataset)):
        s = dataset[i]
        padder = InputPadder(s["image1"][None].shape, mode="kitti")
        img1, img2, m1, m2 = padder.pad(
            *[jnp.asarray(s[k][None]) for k in ("image1", "image2", "mask1", "mask2")]
        )
        if forward is None:
            forward = make_eval_forward(model, variables, iters)
        flow = np.asarray(padder.unpad(forward(img1, img2, m1, m2)))[0]
        mask1 = np.asarray(padder.unpad(m1))[0]

        epe = np.sqrt(np.sum((flow - s["flow"]) ** 2, axis=-1)).ravel()
        mag = np.sqrt(np.sum(s["flow"] ** 2, axis=-1)).ravel()
        val = s["valid"].ravel() >= 0.5

        sel = (mask1[..., 0].ravel() > 0.5) & val
        if sel.any():
            mepe_list.append(epe[sel].mean())
        out = ((epe > 3.0) & ((epe / np.maximum(mag, 1e-12)) > 0.05)).astype(np.float32)
        aepe_list.append(epe[val].mean())
        out_list.append(out[val])
        if progress:
            progress(i, len(dataset))

    return {
        "kitti-epe": float(np.mean(aepe_list)),
        "kitti-f1": float(100 * np.mean(np.concatenate(out_list))),
        f"kitti-{mask_type}": float(np.mean(mepe_list)),
    }
