"""Numeric parity gates: our flax models vs the torch reference (CPU).

Strategy (SURVEY.md §7.4): random-init the reference model, export its
state_dict, import into our flax tree with `torch_state_dict_to_variables`,
run both on the same input, and compare flow fields. Tolerance 1e-2 px max
abs (fp32), usually far tighter at these tiny sizes.
"""

import argparse

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import requires_reference
from focusflow_official_tpu.compat import torch_state_dict_to_variables
from focusflow_official_tpu.models import FFRaft, FFRaftConfig, RAFT

RNG = np.random.RandomState(42)


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def make_ref_cfg(fusion_type="1x1conv", mask_channel=3, mask_modal="point"):
    return argparse.Namespace(
        MODEL=argparse.Namespace(FUSION_TYPE=fusion_type, LOAD_MODULE_TO_BRANCH=False),
        TRAIN=argparse.Namespace(
            MASK_CHANNEL=mask_channel, MASK_MODAL=mask_modal, MASK_DILATE=31,
            KERNEL_SIZE=31, KERNEL_SIGMA=5,
        ),
    )


@requires_reference
class TestVanillaRAFTParity:
    def _run_pair(self, ref_model, our_model, inputs_nchw, iters, variables):
        ref_model.eval()
        with torch.no_grad():
            ref_lr, ref_up = ref_model(
                *[torch.from_numpy(x) for x in inputs_nchw], iters=iters, test_mode=True
            )
        ours_lr, ours_up = our_model.apply(
            variables,
            *[jnp.asarray(to_nhwc(x)) for x in inputs_nchw],
            iters=iters,
            test_mode=True,
        )
        np.testing.assert_allclose(
            to_nchw(np.asarray(ours_up)), ref_up.numpy(), atol=1e-2, rtol=1e-4
        )
        np.testing.assert_allclose(
            to_nchw(np.asarray(ours_lr)), ref_lr.numpy(), atol=1e-2, rtol=1e-4
        )

    def test_basic(self, ref_ffraft_modules):
        ref_raft, _, _ = ref_ffraft_modules
        torch.manual_seed(0)
        ref = ref_raft.RAFT(small=False)

        img1 = RNG.rand(1, 3, 128, 160).astype(np.float32) * 2 - 1
        img2 = RNG.rand(1, 3, 128, 160).astype(np.float32) * 2 - 1

        ours = RAFT(small=False)
        template = ours.init(
            jax.random.PRNGKey(0),
            jnp.asarray(to_nhwc(img1)),
            jnp.asarray(to_nhwc(img2)),
            iters=1,
        )
        variables = torch_state_dict_to_variables(ref.state_dict(), template)
        variables = jax.tree.map(jnp.asarray, variables)
        self._run_pair(ref, ours, (img1, img2), 4, variables)

    def test_small(self, ref_ffraft_modules):
        ref_raft, _, _ = ref_ffraft_modules
        torch.manual_seed(1)
        ref = ref_raft.RAFT(small=True)

        img1 = RNG.rand(1, 3, 128, 160).astype(np.float32) * 2 - 1
        img2 = RNG.rand(1, 3, 128, 160).astype(np.float32) * 2 - 1

        ours = RAFT(small=True)
        template = ours.init(
            jax.random.PRNGKey(0),
            jnp.asarray(to_nhwc(img1)),
            jnp.asarray(to_nhwc(img2)),
            iters=1,
        )
        variables = torch_state_dict_to_variables(ref.state_dict(), template)
        variables = jax.tree.map(jnp.asarray, variables)
        self._run_pair(ref, ours, (img1, img2), 3, variables)


@requires_reference
@pytest.mark.parametrize("fusion_type", ["1x1conv", "SA", "CA", "concat"])
def test_ff_raft_parallel_parity(ref_ffraft_modules, fusion_type):
    """Full FF-RAFT (CCE parallel fusion + fuse_cnet) parity, the flagship path."""
    _, ref_ff_raft, _ = ref_ffraft_modules
    cfg = make_ref_cfg(fusion_type=fusion_type)
    torch.manual_seed(2)
    ref = ref_ff_raft.FF_RAFT_FUSION(
        use_fusion="parallel", fusion_channels=256, raft_small=False,
        fuse_cnet=True, cfg=cfg,
    )
    ref.eval()

    img1 = (RNG.rand(1, 3, 128, 160) * 255).astype(np.float32)
    img2 = (RNG.rand(1, 3, 128, 160) * 255).astype(np.float32)
    mask1 = (RNG.rand(1, 1, 128, 160) > 0.95).astype(np.float32) * 255
    mask2 = (RNG.rand(1, 1, 128, 160) > 0.95).astype(np.float32) * 255

    with torch.no_grad():
        ref_lr, ref_up = ref(
            torch.from_numpy(img1), torch.from_numpy(img2),
            torch.from_numpy(mask1), torch.from_numpy(mask2),
            raft_iters=3, test_mode=True,
        )

    ours = FFRaft(FFRaftConfig(fusion="parallel", fusion_type=fusion_type, fuse_cnet=True))
    args = [jnp.asarray(to_nhwc(x)) for x in (img1, img2, mask1, mask2)]
    template = ours.init(jax.random.PRNGKey(0), *args, iters=1)
    variables = torch_state_dict_to_variables(ref.state_dict(), template)
    variables = jax.tree.map(jnp.asarray, variables)

    ours_lr, ours_up = ours.apply(variables, *args, iters=3, test_mode=True)
    np.testing.assert_allclose(
        to_nchw(np.asarray(ours_up)), ref_up.numpy(), atol=1e-2, rtol=1e-4
    )


@requires_reference
@pytest.mark.parametrize("mode", ["conv", "attention"])
def test_ff_raft_frontend_parity(ref_ffraft_modules, mode):
    """'attention'/'conv' fusion front-ends (`ff_raft.py:84-104`) parity."""
    _, ref_ff_raft, _ = ref_ffraft_modules
    cfg = make_ref_cfg()
    torch.manual_seed(5)
    ref = ref_ff_raft.FF_RAFT_FUSION(
        use_fusion=mode, fusion_channels=32, raft_small=False, cfg=cfg,
    )
    ref.eval()

    img1 = (RNG.rand(1, 3, 128, 160) * 255).astype(np.float32)
    img2 = (RNG.rand(1, 3, 128, 160) * 255).astype(np.float32)
    mask1 = (RNG.rand(1, 1, 128, 160) > 0.95).astype(np.float32) * 255
    mask2 = (RNG.rand(1, 1, 128, 160) > 0.95).astype(np.float32) * 255

    with torch.no_grad():
        _, ref_up = ref(
            torch.from_numpy(img1), torch.from_numpy(img2),
            torch.from_numpy(mask1), torch.from_numpy(mask2),
            raft_iters=2, test_mode=True,
        )

    ours = FFRaft(FFRaftConfig(fusion=mode, fusion_channel=32))
    args = [jnp.asarray(to_nhwc(x)) for x in (img1, img2, mask1, mask2)]
    template = ours.init(jax.random.PRNGKey(0), *args, iters=1)
    variables = torch_state_dict_to_variables(ref.state_dict(), template)
    variables = jax.tree.map(jnp.asarray, variables)

    _, ours_up = ours.apply(variables, *args, iters=2, test_mode=True)
    np.testing.assert_allclose(
        to_nchw(np.asarray(ours_up)), ref_up.numpy(), atol=1e-2, rtol=1e-4
    )


def test_fast_path_consistency():
    """The TPU fast path (bf16 compute + MXU tent-matmul lookup) must stay
    close to the exact path (f32 + gather lookup) on the same weights."""
    cfg_exact = FFRaftConfig(fusion="parallel", fuse_cnet=True,
                             compute_dtype="float32", corr_impl="xla")
    cfg_fast = FFRaftConfig(fusion="parallel", fuse_cnet=True,
                            compute_dtype="bfloat16", corr_impl="mxu")
    m_exact, m_fast = FFRaft(cfg_exact), FFRaft(cfg_fast)

    rng = np.random.RandomState(123)  # independent of test order
    img1 = jnp.asarray((rng.rand(1, 128, 160, 3) * 255).astype(np.float32))
    img2 = jnp.asarray((rng.rand(1, 128, 160, 3) * 255).astype(np.float32))
    mk1 = jnp.asarray(((rng.rand(1, 128, 160, 1) > 0.95) * 255).astype(np.float32))
    mk2 = jnp.asarray(((rng.rand(1, 128, 160, 1) > 0.95) * 255).astype(np.float32))

    variables = m_exact.init(jax.random.PRNGKey(3), img1, img2, mk1, mk2, iters=1)
    # one refinement step: with random (untrained) weights the iteration map
    # is chaotic, so multi-step comparisons diverge regardless of precision
    _, up_exact = m_exact.apply(variables, img1, img2, mk1, mk2, iters=1, test_mode=True)
    _, up_fast = m_fast.apply(variables, img1, img2, mk1, mk2, iters=1, test_mode=True)

    e = np.asarray(up_exact)
    f = np.asarray(up_fast)
    scale = max(np.abs(e).max(), 1.0)
    rel = np.abs(e - f).max() / scale
    # Untrained weights amplify bf16 noise (calibrated round 2: even 30
    # training steps leave the iteration map chaotic — rel ~0.67 at 3
    # iters). A tight trained-weights multi-iteration bound needs a real
    # checkpoint, which cannot be produced or downloaded in this
    # environment; until then this 1-iter bound plus the f32
    # formulation-parity gates in test_corr.py are the decomposition:
    # formulation error <= 2e-4 (exact), so everything beyond that here
    # is bf16 rounding.
    assert rel < 0.15, (rel, scale)
