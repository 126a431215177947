"""jax -> torch export (`variables_to_torch_state_dict`): roundtrip and
reference-model load gates — the inverse of the import parity direction,
so checkpoints trained in this framework can move back to the reference
stack (`/root/reference/core/models/ff-raft/ff_raft.py:75-160`)."""

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import requires_reference
from focusflow_official_tpu.compat.torch_import import (
    torch_state_dict_to_variables, variables_to_torch_state_dict,
)
from focusflow_official_tpu.models import FFRaft, FFRaftConfig


def _variables():
    cfg = FFRaftConfig(fusion="parallel", fusion_type="1x1conv",
                       fuse_cnet=True, iters=2, corr_impl="xla")
    model = FFRaft(cfg)
    rng = np.random.RandomState(0)
    args = [jnp.asarray(rng.rand(1, 128, 160, c) * 255, jnp.float32)
            for c in (3, 3, 1, 1)]
    return model, model.init(jax.random.PRNGKey(0), *args, iters=1)


def test_roundtrip_identity():
    _, variables = _variables()
    sd = variables_to_torch_state_dict(variables)
    back = torch_state_dict_to_variables(sd, variables, strict=True)
    flat_a = jax.tree_util.tree_leaves(variables)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_reference
def test_reference_model_accepts_export(ref_ffraft_modules):
    """torch-init -> import -> EXPORT -> fresh torch model must be
    BIT-EXACT with the original torch model's forward — every key loads
    strict (modulo num_batches_tracked, which our trees don't carry) and
    the weights land byte-identical. (Comparing our-init forwards across
    the two stacks is NOT a valid gate: untrained kaiming weights push
    instance norms into ill-conditioned regimes where the fp paths diverge
    chaotically over iterations.)"""
    import torch

    _, ref_ff_raft, _ = ref_ffraft_modules
    cfg = argparse.Namespace(
        MODEL=argparse.Namespace(FUSION_TYPE="1x1conv", LOAD_MODULE_TO_BRANCH=False),
        TRAIN=argparse.Namespace(MASK_CHANNEL=3, MASK_MODAL="point",
                                 MASK_DILATE=31, KERNEL_SIZE=31, KERNEL_SIGMA=5),
    )
    make_t = lambda seed: (torch.manual_seed(seed) and None) or ref_ff_raft.FF_RAFT_FUSION(
        use_fusion="parallel", fusion_channels=256, raft_small=False,
        fuse_cnet=True, cfg=cfg)
    t_orig = make_t(2)
    t_orig.eval()

    model, template = _variables()
    v = torch_state_dict_to_variables(t_orig.state_dict(), template)

    t_fresh = make_t(99)  # different random init, fully overwritten by load
    sd = {k: torch.from_numpy(np.ascontiguousarray(a))
          for k, a in variables_to_torch_state_dict(v).items()}
    missing, unexpected = t_fresh.load_state_dict(sd, strict=False)
    missing = [m for m in missing if "num_batches_tracked" not in m]
    assert not missing, f"missing keys: {missing[:8]}"
    assert not unexpected, f"unexpected keys: {list(unexpected)[:8]}"
    t_fresh.eval()

    rng = np.random.RandomState(3)
    t = lambda x: torch.from_numpy(x)
    i1 = (rng.rand(1, 3, 128, 160) * 255).astype(np.float32)
    i2 = (rng.rand(1, 3, 128, 160) * 255).astype(np.float32)
    m1 = ((rng.rand(1, 1, 128, 160) > 0.95) * 255).astype(np.float32)
    m2 = ((rng.rand(1, 1, 128, 160) > 0.95) * 255).astype(np.float32)
    with torch.no_grad():
        _, want = t_orig(t(i1), t(i2), t(m1), t(m2), raft_iters=3, test_mode=True)
        _, got = t_fresh(t(i1), t(i2), t(m1), t(m2), raft_iters=3, test_mode=True)
    np.testing.assert_array_equal(got.numpy(), want.numpy())
