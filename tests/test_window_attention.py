"""Fused window-attention kernel vs the XLA partition/merge lowering."""

import numpy as np

import jax
import jax.numpy as jnp

from focusflow_official_tpu.kernels.window_attention import (
    _attention_bwd,
    _forward,
    _xla_attention,
)

RNG = np.random.RandomState(11)


def _qkv(b=2, hp=14, wp=21, c=32):
    q = jnp.asarray(RNG.randn(b, hp, wp, c).astype(np.float32))
    k = jnp.asarray(RNG.randn(b, hp, wp, c).astype(np.float32))
    v = jnp.asarray(RNG.randn(b, hp, wp, c).astype(np.float32))
    return q, k, v


def test_kernel_matches_xla_interpret():
    q, k, v = _qkv()
    heads, ws = 4, 7
    scale = (32 // heads) ** -0.5
    want = np.asarray(_xla_attention(q, k, v, ws, heads, scale))
    got = np.asarray(_forward(q, k, v, ws, heads, scale, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_kernel_matches_xla_single_window_row():
    # wp == ws: one window per row; also odd head dim
    q, k, v = _qkv(b=1, hp=7, wp=7, c=24)
    heads, ws = 8, 7
    scale = (24 // heads) ** -0.5
    want = np.asarray(_xla_attention(q, k, v, ws, heads, scale))
    got = np.asarray(_forward(q, k, v, ws, heads, scale, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_custom_vjp_matches_xla_grads():
    q, k, v = _qkv(b=1, hp=7, wp=14, c=16)
    heads, ws = 2, 7
    scale = (16 // heads) ** -0.5
    g = jnp.asarray(RNG.randn(1, 7, 14, 16).astype(np.float32))

    want = jax.vjp(
        lambda a, b_, c_: _xla_attention(a, b_, c_, ws, heads, scale),
        q, k, v)[1](g)
    got = _attention_bwd(ws, heads, scale, (q, k, v), g)
    for gw, gg in zip(want, got):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   atol=1e-5, rtol=1e-5)
