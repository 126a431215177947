"""User-facing inference API: checkpoint -> flow in three lines.

The reference exposes inference only through its evaluation scripts
(`/root/reference/core/models/ff-raft/evaluate.py:47-86` is the closest
thing to a predict entry point); this wraps the same forward path —
/8 padding, test-mode forward, unpad — behind one object:

    from focusflow_official_tpu.predict import FlowPredictor
    p = FlowPredictor("configs/ff-raft/experiment/kitti_gf.yaml",
                      "runs/<run>/export")          # orbax dir or torch .pth
    flow = p(img1, img2, mask1, mask2)              # (H, W, 2) float32

TPU-shaped: one jit per input resolution, cached — repeated calls at the
same shape pay zero retrace; a `pad_to` bucket collapses mixed shapes onto
one compile (the KITTI-eval bucketing trick, `train/evaluate.py`).
Accepts HWC or NHWC, uint8 or float; masks default to zeros (no keypoint
prior) which is the reference's behavior for maskless frames.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .config import load_yaml_config
from .ops.padding import InputPadder


def _as_nhwc(arr, channels: int) -> np.ndarray:
    a = np.asarray(arr, np.float32)
    if a.ndim == 2:
        a = a[..., None]
    if a.ndim == 3:
        a = a[None]
    assert a.ndim == 4, f"expected HWC or NHWC, got shape {a.shape}"
    if a.shape[-1] != channels and channels == 3 and a.shape[-1] == 1:
        a = np.tile(a, (1, 1, 1, 3))
    return a


class FlowPredictor:
    """Load a config + checkpoint once; call on frame pairs.

    checkpoint: an orbax export/step directory or a torch `.pth`/`.pth.tar`
    (the reference's own checkpoints load through `compat.torch_import`).
    pad_to: optional (H, W) canonical bucket — mixed input resolutions
    share one compile (metrics-free analog of the KITTI eval bucketing).
    """

    def __init__(self, yaml_path: str, checkpoint: str, *,
                 compute_dtype: str = "bfloat16", corr_impl: str = "auto",
                 iters: Optional[int] = None,
                 pad_to: Optional[Tuple[int, int]] = None):
        from .cli.train import build_model_and_loss, load_torch_pretrained

        cfg = load_yaml_config(yaml_path)
        shim = argparse.Namespace(compute_dtype=compute_dtype,
                                  corr_impl=corr_impl)
        self.family, _mcfg, self.model, _loss, cfg_iters = \
            build_model_and_loss(cfg, shim)
        self.iters = iters or cfg_iters or 12
        self.pad_to = pad_to

        zeros = lambda c: jnp.zeros((1, 64, 64, c), jnp.float32)
        template = self.model.init(jax.random.PRNGKey(0), zeros(3), zeros(3),
                                   zeros(1), zeros(1), iters=1)
        if checkpoint.endswith((".pth", ".pth.tar", ".pt")):
            variables = load_torch_pretrained(checkpoint, dict(template))
        else:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            variables = ckptr.restore(
                os.path.abspath(checkpoint),
                {"params": template["params"],
                 "batch_stats": template.get("batch_stats", {})},
            )
        self.variables = jax.tree.map(jnp.asarray, dict(variables))
        from .train.evaluate import make_eval_forward

        # one jax.jit forward: XLA caches one executable per input shape,
        # so repeated same-shape calls pay zero retrace
        self._forward = make_eval_forward(self.model, self.variables,
                                          self.iters)

    def __call__(self, image1, image2, mask1=None, mask2=None) -> np.ndarray:
        """frames (+ optional keypoint masks) -> upsampled flow.

        Returns (H, W, 2) float32 for HWC inputs, (B, H, W, 2) for NHWC.
        """
        single = np.asarray(image1).ndim == 3
        i1 = _as_nhwc(image1, 3)
        i2 = _as_nhwc(image2, 3)
        b, h, w = i1.shape[:3]
        m1 = (np.zeros((b, h, w, 1), np.float32) if mask1 is None
              else _as_nhwc(mask1, 1))
        m2 = (np.zeros((b, h, w, 1), np.float32) if mask2 is None
              else _as_nhwc(mask2, 1))

        if self.pad_to is not None:
            th, tw = self.pad_to
            assert th >= h and tw >= w, (f"pad_to {self.pad_to} smaller "
                                         f"than input {(h, w)}")
            grow = lambda a: np.pad(
                a, ((0, 0), (0, th - h), (0, tw - w), (0, 0)), mode="edge")
            i1, i2, m1, m2 = grow(i1), grow(i2), grow(m1), grow(m2)

        padder = InputPadder(i1.shape)
        p1, p2, pm1, pm2 = padder.pad(*map(jnp.asarray, (i1, i2, m1, m2)))
        flow = self._forward(p1, p2, pm1, pm2)
        flow = np.asarray(padder.unpad(flow), np.float32)[:, :h, :w]
        return flow[0] if single else flow

    def sequence(self, frames, masks=None, *, warm_start: bool = True) -> np.ndarray:
        """Consecutive-pair flow over a video clip.

        frames: (T, H, W, 3) array or list of HWC frames; masks: optional,
        same length. warm_start forward-splats each pair's low-res flow
        into the next pair's `flow_init` (`ops.forward_interpolate`) — the
        reference's Sintel-submission warm start (`evaluate.py:47-66`
        analog). Returns (T-1, H, W, 2) float32.
        """
        from .ops.coords import forward_interpolate
        from .train.submission import _forward_with_lowres

        forward = _forward_with_lowres(self.model, self.variables, self.iters)
        frames = [_as_nhwc(f, 3)[0] for f in frames]
        h, w = frames[0].shape[:2]
        masks = ([np.zeros((h, w, 1), np.float32)] * len(frames) if masks is None
                 else [_as_nhwc(m, 1)[0] for m in masks])
        assert len(frames) >= 2 and len(masks) == len(frames)

        flows, flow_prev = [], None
        for i in range(len(frames) - 1):
            padder = InputPadder(frames[i][None].shape)
            args = padder.pad(*[jnp.asarray(a[None]) for a in (
                frames[i], frames[i + 1], masks[i], masks[i + 1])])
            init = None if flow_prev is None else jnp.asarray(flow_prev[None])
            flow_up, flow_lr = forward(*args, init)
            flows.append(np.asarray(padder.unpad(flow_up), np.float32)[0])
            if warm_start:
                flow_prev = forward_interpolate(np.asarray(flow_lr)[0])
        return np.stack(flows)
