"""Pad-to-divisible input padding (NHWC).

Equivalent of the reference `InputPadder`
(`/root/reference/core/utils/utils.py:7-24`): pads H and W up to a multiple
of 8 with replicate (edge) padding; 'sintel' mode centers the pad, 'kitti'
mode pads only at the bottom (and splits W like sintel).
"""

from __future__ import annotations

import jax.numpy as jnp


class InputPadder:
    """Pads NHWC images so H and W are divisible by `divis` (default 8)."""

    def __init__(self, dims, mode: str = "sintel", divis: int = 8):
        # dims: a shape tuple whose [-3:-1] are (H, W) for NHWC inputs.
        self.ht, self.wd = dims[-3], dims[-2]
        d = divis
        pad_ht = (((self.ht // d) + 1) * d - self.ht) % d
        pad_wd = (((self.wd // d) + 1) * d - self.wd) % d
        if mode == "sintel":
            # (left, right, top, bottom)
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    def pad(self, *inputs):
        l, r, t, b = self._pad
        out = [jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge") for x in inputs]
        return out if len(out) > 1 else out[0]

    def unpad(self, x):
        ht, wd = x.shape[-3], x.shape[-2]
        l, r, t, b = self._pad
        return x[..., t : ht - b, l : wd - r, :]
