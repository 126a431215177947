"""Parity tests for the mask modality preparation vs the reference init_mask."""

import argparse

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conftest import requires_reference
from focusflow_official_tpu.models.mask_modal import init_mask

RNG = np.random.RandomState(17)


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _cfg(modal, channel=3, dilate=7, ksize=9, sigma=2.0):
    return argparse.Namespace(TRAIN=argparse.Namespace(
        MASK_MODAL=modal, MASK_CHANNEL=channel, MASK_DILATE=dilate,
        KERNEL_SIZE=ksize, KERNEL_SIGMA=sigma,
    ))


@requires_reference
@pytest.mark.parametrize("modal", ["point", "neighborE", "neighborG", "context", "frame"])
def test_init_mask_parity(ref_ffraft_modules, modal):
    _, ref_ff_raft, _ = ref_ffraft_modules

    img1 = (RNG.rand(2, 3, 40, 56) * 255).astype(np.float32)
    img2 = (RNG.rand(2, 3, 40, 56) * 255).astype(np.float32)
    m1 = ((RNG.rand(2, 1, 40, 56) > 0.9) * 255).astype(np.float32)
    m2 = ((RNG.rand(2, 1, 40, 56) > 0.9) * 255).astype(np.float32)

    want1, want2 = ref_ff_raft.init_mask(
        torch.from_numpy(img1), torch.from_numpy(img2),
        torch.from_numpy(m1), torch.from_numpy(m2), _cfg(modal)
    )
    got1, got2 = init_mask(
        jnp.asarray(to_nhwc(img1)), jnp.asarray(to_nhwc(img2)),
        jnp.asarray(to_nhwc(m1)), jnp.asarray(to_nhwc(m2)),
        mask_modal=modal, mask_channel=3, mask_dilate=7,
        kernel_size=9, kernel_sigma=2.0,
    )
    np.testing.assert_allclose(
        to_nchw(np.asarray(got1)), np.asarray(want1, np.float32), atol=1e-3
    )
    np.testing.assert_allclose(
        to_nchw(np.asarray(got2)), np.asarray(want2, np.float32), atol=1e-3
    )
