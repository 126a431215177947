"""Keypoint-mask modality preparation (pure jnp, NHWC).

Equivalent of the reference `init_mask`
(`/root/reference/core/models/ff-raft/FF_RAFT_Core/ff_raft.py:12-72`): turns
the raw single-channel 0/255 keypoint mask into the model's conditioning
input, per TRAIN.MASK_MODAL:

- 'point'     : repeat to `mask_channel` channels; mask2 <- all-255
- 'neighborE' : binary dilation with an ellipse structuring element
- 'neighborG' : Gaussian smear, renormalized to peak 255
- 'context'   : dilated mask gates image1; mask2 <- image2
- 'frame'     : mask <- image (unconditioned control)

Kernels are static numpy constants baked into the jit'd graph; the dilation /
smear is one small depthwise conv that XLA fuses into the input pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def ellipse_kernel(size: int) -> np.ndarray:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (size, size)) without cv2.

    OpenCV rasterizes an ellipse with half-axes (size//2) and fills rows
    between the edge points; this reproduces its integer midpoint math.
    """
    try:
        import cv2

        return cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size)).astype(np.float32)
    except Exception:
        r = size // 2
        inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
        kernel = np.zeros((size, size), np.float32)
        for i in range(size):
            dy = abs(i - r)
            if dy <= r:
                dx = int(round(r * np.sqrt(max(0.0, 1.0 - dy * dy * inv_r2))))
                kernel[i, max(0, r - dx) : min(size, r + dx + 1)] = 1.0
        return kernel


@functools.lru_cache(maxsize=None)
def gaussian_kernel(kernel_size: int, sigma: float) -> np.ndarray:
    """Normalized Gaussian kernel, identical math to the reference `get_kernel`
    (`ff_raft.py:12-20` and `losses/losses.py:7-15`): sampled on
    linspace(-3*sigma, 3*sigma, k) and normalized to sum 1."""
    s3 = 3.0 * sigma
    xs = np.linspace(-s3, s3, kernel_size)
    x, y = np.meshgrid(xs, xs)
    g = 1.0 / (2 * np.pi * sigma**2) * np.exp(-(x**2 + y**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_conv(x: jnp.ndarray, kernel: np.ndarray, padding: int) -> jnp.ndarray:
    """Conv of (B, H, W, C) with a single 2D kernel applied per channel."""
    c = x.shape[-1]
    k = jnp.asarray(kernel)[:, :, None, None]  # (kh, kw, 1, 1)
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        k,
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def init_mask(image1, image2, mask1, mask2, *, mask_modal: str, mask_channel: int = 3,
              mask_dilate: int = 31, kernel_size: int = 31, kernel_sigma: float = 5.0,
              tile_channels: bool = True):
    """Prepare (mask1, mask2) conditioning inputs from raw 0/255 masks (NHWC).

    tile_channels=False keeps the point/neighbor modalities single-channel:
    consumers whose first conv folds its kernel over identical tiled input
    channels (`nn.blocks.TiledInputConv`) skip materializing the full-res
    C-channel tile (a 1.15 ms padded-layout broadcast at bench shapes).
    The context/frame modalities are image-valued and unaffected."""
    if not tile_channels:
        mask_channel = mask1.shape[-1]
    if mask_modal == "point":
        if mask1.shape[-1] != mask_channel:
            mask1 = jnp.tile(mask1, (1, 1, 1, mask_channel))
        mask2 = jnp.full_like(mask1, 255.0)

    elif mask_modal == "neighborE":
        d = mask_dilate
        dil = _depthwise_conv(mask1 / 255.0, ellipse_kernel(d), d // 2) > 0
        mask1 = dil.astype(jnp.float32) * 255.0
        if mask1.shape[-1] != mask_channel:
            mask1 = jnp.tile(mask1, (1, 1, 1, mask_channel))
        mask2 = jnp.full_like(mask1, 255.0)

    elif mask_modal == "neighborG":
        g = gaussian_kernel(kernel_size, kernel_sigma)
        sm = _depthwise_conv(mask1, g, kernel_size // 2)
        mask1 = sm * 255.0 / jnp.maximum(sm.max(), 1e-12)
        if mask1.shape[-1] != mask_channel:
            mask1 = jnp.tile(mask1, (1, 1, 1, mask_channel))
        mask2 = jnp.full_like(mask1, 255.0)

    elif mask_modal == "context":
        d = mask_dilate
        dil = _depthwise_conv(mask1 / 255.0, ellipse_kernel(d), d // 2) > 0
        mask1 = dil.astype(image1.dtype) * image1
        mask2 = image2

    elif mask_modal == "frame":
        mask1 = image1
        mask2 = image2

    else:
        raise ValueError(f"Unknown mask modal: {mask_modal}")

    return mask1, mask2
