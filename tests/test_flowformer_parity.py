"""FF-FlowFormer end-to-end numeric parity vs the torch reference (CPU).

timm isn't installed, so `fake_timm.install_fake_timm()` provides a faithful
torch Twins-SVT-Large (the dependency-stubbing pattern proven for cupy in
`test_pwc_parity.py`); the reference model is built with random weights,
its full state_dict is imported through `compat.torch_import` (561 params,
1:1 key mapping), and the decoded flows are compared per iteration.

Reference: `FF_FlowFormer_Core/FlowFormer/LatentCostFormer/transformer.py:
85-176` (FlowFormer + FF_FlowFormer tops).
"""

import os
import sys
import types
from argparse import Namespace

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, requires_reference
from focusflow_official_tpu.compat import torch_state_dict_to_variables
from focusflow_official_tpu.models.ff_flowformer import (
    FFFlowFormer,
    FlowFormer,
    FlowFormerConfig,
)

pytestmark = pytest.mark.slow  # multi-minute suite; -m 'not slow' skips

RNG = np.random.RandomState(11)
DEPTH = 3  # decoder iterations under test (full model runs 12)


@pytest.fixture(scope="session")
def ref_build_flowformer():
    from fake_timm import install_fake_timm

    install_fake_timm()
    try:
        import loguru  # noqa: F401
    except ImportError:
        mod = types.ModuleType("loguru")

        class _Logger:
            def __getattr__(self, _):
                return lambda *a, **k: None

        mod.logger = _Logger()
        sys.modules["loguru"] = mod

    path = os.path.join(REFERENCE_ROOT, "core/models/ff-flowformer")
    if path not in sys.path:
        sys.path.insert(0, path)
    from FF_FlowFormer_Core.FlowFormer import build_flowformer

    return build_flowformer


def _ref_cfg(fusion: str) -> Namespace:
    """The shipped `config/ff_chairs.yaml` MODEL block (`:36-79`), with a
    shorter decoder for test wall-clock."""
    return Namespace(
        FUSION=fusion, MASK_MODAL="point", MASK_CHANNEL=3, MASK_DILATE=31,
        pe="linear", dropout=0.0, encoder_latent_dim=256, query_latent_dim=64,
        cost_latent_input_dim=64, cost_latent_token_num=8, cost_latent_dim=128,
        predictor_dim=128, motion_feature_dim=209, arc_type="transformer",
        cost_heads_num=1, pretrain=True, context_concat=False, encoder_depth=3,
        feat_cross_attn=False, patch_size=8, patch_embed="single", no_pe=False,
        gma="GMA", kernel_size=9, rm_res=True, vert_c_dim=64,
        cost_encoder_res=True, cnet="twins", fnet="twins", only_global=False,
        add_flow_token=True, use_mlp=False, vertical_conv=False,
        decoder_depth=DEPTH, critical_params=[], pretrain_model=None,
        load_former=None, ALT_CORR=False,
    )


def _inputs(b=1, h=64, w=128):
    img1 = (RNG.rand(b, h, w, 3) * 255).astype(np.float32)
    img2 = (RNG.rand(b, h, w, 3) * 255).astype(np.float32)
    mask1 = ((RNG.rand(b, h, w, 1) > 0.99) * 255).astype(np.float32)
    mask2 = ((RNG.rand(b, h, w, 1) > 0.99) * 255).astype(np.float32)
    return img1, img2, mask1, mask2


def _to_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _flow_parity(ref_build_flowformer, fusion):
    torch.manual_seed(3)
    ref = ref_build_flowformer(_ref_cfg(fusion))
    # train mode -> the decoder returns the per-iteration flow list
    # (`decoder.py:257-260`); all dropout rates are 0 so it's numerically
    # identical to eval.
    ref.train()

    img1, img2, mask1, mask2 = _inputs()
    with torch.no_grad():
        if fusion == "parallel":
            want = ref(_to_nchw(img1), _to_nchw(img2), _to_nchw(mask1),
                       _to_nchw(mask2))
        else:
            want = ref(_to_nchw(img1), _to_nchw(img2))
    assert len(want) == DEPTH

    cfg = FlowFormerConfig(
        fusion="parallel" if fusion == "parallel" else None,
        decoder_depth=DEPTH, compute_dtype="float32", corr_impl="xla",
    )
    model = (FFFlowFormer if fusion == "parallel" else FlowFormer)(cfg)
    args = (jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(mask1),
            jnp.asarray(mask2))
    variables = model.init(jax.random.PRNGKey(0), *args)
    imported = torch_state_dict_to_variables(
        ref.state_dict(), {"params": variables["params"]}, strict=True
    )
    flows = model.apply({"params": imported["params"]}, *args, train=False)
    assert flows.shape[0] == DEPTH

    for it in range(DEPTH):
        got = np.transpose(np.asarray(flows[it]), (0, 3, 1, 2))
        np.testing.assert_allclose(
            got, want[it].numpy(), atol=1e-2, rtol=1e-3,
            err_msg=f"iteration {it} ({fusion})",
        )


@requires_reference
def test_ff_flowformer_parity_parallel(ref_build_flowformer):
    """CCE FF_FlowFormer: full forward parity over 3 decoder iterations."""
    _flow_parity(ref_build_flowformer, "parallel")


@requires_reference
def test_flowformer_parity_vanilla(ref_build_flowformer):
    """Vanilla FlowFormer: full forward parity over 3 decoder iterations."""
    _flow_parity(ref_build_flowformer, "none")
