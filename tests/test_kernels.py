"""Pallas kernel unit tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from focusflow_official_tpu.kernels.instance_norm import (
    _forward,
    _xla_instance_norm,
    instance_norm_pallas,
)

RNG = np.random.RandomState(9)


class TestInstanceNormKernel:
    @pytest.mark.parametrize("shape,relu", [
        ((2, 20, 24, 64), False),
        ((2, 20, 24, 64), True),
        ((1, 13, 17, 96), True),   # odd HW: tail-chunk masking
        ((1, 9, 11, 128), False),
    ])
    def test_matches_xla(self, shape, relu):
        x = jnp.asarray(RNG.randn(*shape).astype(np.float32) * 3 + 1)
        want = np.asarray(_xla_instance_norm(x, 1e-5, relu))
        got = np.asarray(_forward(x, 1e-5, relu, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_bf16(self):
        x = jnp.asarray(RNG.randn(1, 16, 16, 64).astype(np.float32)).astype(jnp.bfloat16)
        want = np.asarray(_xla_instance_norm(x, 1e-5, True).astype(jnp.float32))
        got = np.asarray(_forward(x, 1e-5, True, interpret=True).astype(jnp.float32))
        np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-2)

    def test_grad_matches_xla_autodiff(self):
        x = jnp.asarray(RNG.randn(1, 8, 8, 64).astype(np.float32))

        def loss_pallas(x):
            return jnp.sum(jnp.sin(instance_norm_pallas(x, 1e-5, True)))

        def loss_xla(x):
            return jnp.sum(jnp.sin(_xla_instance_norm(x, 1e-5, True)))

        g1 = np.asarray(jax.grad(loss_pallas)(x))
        g2 = np.asarray(jax.grad(loss_xla)(x))
        np.testing.assert_allclose(g1, g2, atol=1e-4, rtol=1e-4)
