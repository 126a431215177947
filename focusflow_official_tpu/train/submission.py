"""Benchmark submission writers: Sintel (.flo) and KITTI (uint16 PNG).

The reference stops at validation (`evaluate.py` has no submission path);
these complete the workflow for the official test servers, using the
datasets' `is_test` mode (which yields images+masks+extra_info only) and
the padding protocol of the matching validation functions. Sintel supports
the RAFT-style warm start between consecutive frames of a scene
(`ops.forward_interpolate`).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.io import write_flo, write_flow_kitti
from ..ops.coords import forward_interpolate
from ..ops.padding import InputPadder
from .evaluate import make_eval_forward


def _forward_with_lowres(model, variables, iters):
    @jax.jit
    def forward(image1, image2, mask1, mask2, flow_init):
        out = model.apply(variables, image1, image2, mask1, mask2, iters=iters,
                          flow_init=flow_init, test_mode=True)
        if isinstance(out, (tuple, list)):
            full = [o for o in out if o.shape[1:3] == image1.shape[1:3]]
            low = [o for o in out if o.shape[1:3] != image1.shape[1:3]]
            return full[0], (low[0] if low else full[0])
        return out, out

    return forward


def create_sintel_submission(model, variables, datasets: Dict[str, object],
                             output_path: str, iters: int = 32,
                             warm_start: bool = False) -> None:
    """datasets: {'clean': MpiSintel(split='testing', dstype='clean'), ...}."""
    forward = _forward_with_lowres(model, variables, iters)
    for dstype, dataset in datasets.items():
        flow_prev, scene_prev = None, None
        for i in range(len(dataset)):
            s = dataset[i]
            scene, frame_id = s["extra_info"]
            if scene != scene_prev:
                flow_prev = None
            padder = InputPadder(s["image1"][None].shape)
            args = padder.pad(*[jnp.asarray(s[k][None])
                                for k in ("image1", "image2", "mask1", "mask2")])
            init = None if flow_prev is None else jnp.asarray(flow_prev[None])
            flow_up, flow_lr = forward(*args, init)
            flow = np.asarray(padder.unpad(flow_up))[0]

            if warm_start:
                flow_prev = forward_interpolate(np.asarray(flow_lr)[0])
            scene_prev = scene

            out_dir = os.path.join(output_path, dstype, scene)
            os.makedirs(out_dir, exist_ok=True)
            write_flo(os.path.join(out_dir, f"frame{frame_id + 1:04d}.flo"), flow)


def create_kitti_submission(model, variables, dataset, output_path: str,
                            iters: int = 24) -> None:
    """dataset: KITTI(split='testing') — writes flow PNGs named like the inputs."""
    forward = _forward_with_lowres(model, variables, iters)
    os.makedirs(output_path, exist_ok=True)
    for i in range(len(dataset)):
        s = dataset[i]
        (frame_id,) = s["extra_info"]
        padder = InputPadder(s["image1"][None].shape, mode="kitti")
        args = padder.pad(*[jnp.asarray(s[k][None])
                            for k in ("image1", "image2", "mask1", "mask2")])
        flow_up, _ = forward(*args, None)
        flow = np.asarray(padder.unpad(flow_up))[0]
        write_flow_kitti(os.path.join(output_path, frame_id), flow)
