"""Residual building blocks for the stride-8 encoders (NHWC).

Equivalents of the reference ResidualBlock / BottleneckBlock
(`/root/reference/core/models/ff-raft/FF_RAFT_Core/extractor.py:6-116`).
Conv kernels use kaiming-normal fan-out init (the reference's init loop,
`extractor.py:150-157`); biases use the torch default uniform init.

Note the reference quirk: the downsample branch reuses the block's `norm3`
(`norm4` for bottleneck) module instance; we name our downsample norm the
same so torch checkpoints map directly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .norm import Norm

kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

# torch Conv2d DEFAULT kernel init: kaiming_uniform(a=sqrt(5)) == gain^2=1/3
# fan-in uniform -> U(+-1/sqrt(fan_in)). The PWC family must use this: the
# reference has NO init loop there (unlike the RAFT extractor's explicit
# kaiming loop, `extractor.py:150-157`), and kaiming fan-out through PWC's
# DenseNet flow heads + coarse-to-fine feedback amplifies the init-time flow
# by ~20x PER LEVEL (measured: 8.6e7 px EPE at init, which then trains into
# an input-insensitive predict-the-mean collapse).
torch_default = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(key, shape, dtype, fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)
    import jax.random as jrandom

    return jrandom.uniform(key, shape, dtype, -bound, bound)


def conv2d(
    features: int,
    kernel: int | tuple[int, int],
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] | None = None,
    use_bias: bool = True,
    name: str | None = None,
    dtype=jnp.float32,
    in_features: int | None = None,
    kernel_init=None,
) -> nn.Conv:
    """A torch-convention Conv2d: explicit symmetric zero padding (default k//2)."""
    if kernel_init is None:
        kernel_init = kaiming_out
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(stride, int):
        stride = (stride, stride)
    if padding is None:
        padding = (kernel[0] // 2, kernel[1] // 2)
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = ((padding[0], padding[0]), (padding[1], padding[1]))

    if use_bias and in_features is not None:
        fan_in = in_features * kernel[0] * kernel[1]
        bias_init = lambda key, shape, dtype=jnp.float32: torch_bias_init(key, shape, dtype, fan_in)
    else:
        bias_init = nn.initializers.zeros
    # HIGHEST keeps f32 convs at full precision (free for bf16 inputs, which
    # already use the MXU's native bf16xbf16->f32 path).
    return nn.Conv(
        features,
        kernel,
        strides=stride,
        padding=pad,
        use_bias=use_bias,
        kernel_init=kernel_init,
        bias_init=bias_init,
        dtype=dtype,
        param_dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
        name=name,
    )


class TiledInputConv(nn.Module):
    """7x7/stride-2 stem conv declared over `declared_in` input channels whose
    input may arrive as ONE channel standing for `declared_in` identical tiled
    copies (`init_mask(..., tile_channels=False)`).

    Parameter tree ({kernel: (7, 7, declared_in, F), bias}) is checkpoint-
    identical to the plain stem; by linearity conv(tile(x, C), W) ==
    conv(x, W.sum(in_axis)), so the kernel is summed (loop-invariant, f32)
    instead of materializing the full-res C-channel tile — the broadcast
    alone profiled 1.15 ms at bench shapes (padded-lane writes).
    """

    features: int
    declared_in: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", kaiming_out, (7, 7, self.declared_in, self.features),
            jnp.float32)
        fan_in = self.declared_in * 49
        bias = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: torch_bias_init(key, shape, dtype, fan_in),
            (self.features,), jnp.float32)
        if x.shape[-1] == 1 and self.declared_in != 1:
            k = kernel.sum(axis=2, keepdims=True)
        else:
            assert x.shape[-1] == self.declared_in, (x.shape, self.declared_in)
            k = kernel
        d = self.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(d), k.astype(d), window_strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        return y + bias.astype(d)


def conv_transpose2d(
    features: int,
    kernel: int = 4,
    stride: int = 2,
    name: str | None = None,
    dtype=jnp.float32,
    kernel_init=None,
) -> nn.ConvTranspose:
    """torch ConvTranspose2d(k=4, s=2, p=1) equivalent (exact 2x upsample).

    Empirically flax needs padding ((2,2),(2,2)) + transpose_kernel=True to
    reproduce torch's semantics; the torch weight (I, O, kh, kw) maps with the
    same (2,3,1,0) transpose as regular convs.
    """
    k = (kernel, kernel)
    return nn.ConvTranspose(
        features,
        k,
        strides=(stride, stride),
        padding=((2, 2), (2, 2)),
        transpose_kernel=True,
        kernel_init=kernel_init if kernel_init is not None else kaiming_out,
        dtype=dtype,
        param_dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
        name=name,
    )


class StemConv(nn.Module):
    """7x7/stride-2/pad-3 stem conv computed via space-to-depth.

    A 3-channel 7x7 stem uses 3/128 of the MXU's input lanes; reshaping the
    input 2x2-to-depth and the (zero-padded-to-8) kernel to 4x4x(4*in) is
    mathematically identical (verified to bf16 rounding) and ~7x faster on
    v5e *standalone* (0.90 -> 0.13 ms at 4x440x1024). NOT wired into the
    encoders: in the full graph the 6D input transpose breaks XLA's fusion
    with surrounding elementwise ops and the encoder gets ~2 ms SLOWER
    (measured 18.6 -> 20.9 ms). Kept for the future Pallas stem where the
    space-to-depth can fuse into the DMA. Parameters keep the
    torch-compatible (7, 7, in, out) shape.
    """

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin, cout = self.in_features, self.features
        kernel = self.param("kernel", kaiming_out, (7, 7, cin, cout), jnp.float32)
        bias_init = lambda key, shape, dtype=jnp.float32: torch_bias_init(
            key, shape, dtype, cin * 49)
        bias = self.param("bias", bias_init, (cout,), jnp.float32)

        b, h, w, _ = x.shape
        d = self.dtype
        x = x.astype(d)
        if h % 2 or w % 2:  # odd sizes: plain conv (shapes rarely hit this)
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(d), (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST)
            return y + bias.astype(d)

        # kernel: zero tap at ky=-1/kx=-1, then fold 2x2 phases into channels
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8,8,in,out)
        ks = kp.reshape(4, 2, 4, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
        ks = ks.reshape(4, 4, 4 * cin, cout).astype(d)

        s2d = x.reshape(b, h // 2, 2, w // 2, 2, cin)
        s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * cin)
        y = jax.lax.conv_general_dilated(
            s2d, ks, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        return y + bias.astype(d)


def _stem(dtype):
    """Factory for the 7x7/stride-2 stem: plain conv by default, the
    space-to-depth `StemConv` under FF_S2D_STEM=1 (A/B knob; parameter
    tree identical either way, see StemConv's docstring for measurements)."""
    import os

    if os.environ.get("FF_S2D_STEM") == "1":
        return lambda feats, in_feats, name: StemConv(
            feats, in_feats, name=name, dtype=dtype)
    return lambda feats, in_feats, name: conv2d(
        feats, 7, 2, 3, name=name, dtype=dtype, in_features=in_feats)


class ResidualBlock(nn.Module):
    in_planes: int
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True,
                 is_eval: bool | None = None,
                 row_chunks: tuple[int, int] | None = None) -> jnp.ndarray:
        d = self.dtype
        num_groups = self.planes // 8
        y = conv2d(self.planes, 3, self.stride, 1, name="conv1", dtype=d, in_features=self.in_planes)(x)
        y = Norm(self.norm_fn, self.planes, num_groups, name="norm1", dtype=d)(y, use_running_average, fuse_relu=True, is_eval=is_eval, row_chunks=row_chunks)
        y = conv2d(self.planes, 3, 1, 1, name="conv2", dtype=d, in_features=self.planes)(y)
        y = Norm(self.norm_fn, self.planes, num_groups, name="norm2", dtype=d)(y, use_running_average, fuse_relu=True, is_eval=is_eval, row_chunks=row_chunks)

        if self.stride != 1:
            x = conv2d(self.planes, 1, self.stride, 0, name="downsample_conv", dtype=d, in_features=self.in_planes)(x)
            x = Norm(self.norm_fn, self.planes, num_groups, name="norm3", dtype=d)(x, use_running_average, is_eval=is_eval, row_chunks=row_chunks)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    in_planes: int
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True,
                 is_eval: bool | None = None) -> jnp.ndarray:
        d = self.dtype
        p4 = self.planes // 4
        num_groups = self.planes // 8
        y = conv2d(p4, 1, 1, 0, name="conv1", dtype=d, in_features=self.in_planes)(x)
        y = Norm(self.norm_fn, p4, num_groups, name="norm1", dtype=d)(y, use_running_average, fuse_relu=True, is_eval=is_eval)
        y = conv2d(p4, 3, self.stride, 1, name="conv2", dtype=d, in_features=p4)(y)
        y = Norm(self.norm_fn, p4, num_groups, name="norm2", dtype=d)(y, use_running_average, fuse_relu=True, is_eval=is_eval)
        y = conv2d(self.planes, 1, 1, 0, name="conv3", dtype=d, in_features=p4)(y)
        y = Norm(self.norm_fn, self.planes, num_groups, name="norm3", dtype=d)(y, use_running_average, fuse_relu=True, is_eval=is_eval)

        if self.stride != 1:
            x = conv2d(self.planes, 1, self.stride, 0, name="downsample_conv", dtype=d, in_features=self.in_planes)(x)
            x = Norm(self.norm_fn, self.planes, num_groups, name="norm4", dtype=d)(x, use_running_average, is_eval=is_eval)
        return nn.relu(x + y)
