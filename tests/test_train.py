"""Trainer tests: OneCycle schedule parity, multichip dry run, tiny-train smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from focusflow_official_tpu.losses import build_sequence_loss
from focusflow_official_tpu.models import FFRaft, FFRaftConfig
from focusflow_official_tpu.train.loop import (
    build_optimizer,
    create_train_state,
    make_train_step,
)
from focusflow_official_tpu.train.mesh import make_mesh, put_batch, replicate
from focusflow_official_tpu.train.schedule import one_cycle_lr
from focusflow_official_tpu.train.surgery import copy_to_branch, freeze_mask_for_parallel

pytestmark = pytest.mark.slow  # multi-minute suite; -m 'not slow' skips

RNG = np.random.RandomState(5)


def _tiny_batch(b=2, h=64, w=96):
    return {
        "image1": (RNG.rand(b, h, w, 3) * 255).astype(np.float32),
        "image2": (RNG.rand(b, h, w, 3) * 255).astype(np.float32),
        "mask1": ((RNG.rand(b, h, w, 1) > 0.95) * 255).astype(np.float32),
        "mask2": ((RNG.rand(b, h, w, 1) > 0.95) * 255).astype(np.float32),
        "flow": (RNG.randn(b, h, w, 2) * 2).astype(np.float32),
        "valid": np.ones((b, h, w), np.float32),
    }


class TestOneCycle:
    def test_matches_torch(self):
        import torch

        max_lr, total = 4e-4, 1100
        m = torch.nn.Linear(2, 2)
        opt = torch.optim.AdamW(m.parameters(), lr=max_lr)
        sched = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr, total, pct_start=0.05, cycle_momentum=False,
            anneal_strategy="linear",
        )
        ours = one_cycle_lr(max_lr, total, pct_start=0.05)
        got = np.asarray(jax.vmap(ours)(jnp.arange(total)))
        want = []
        for t in range(total):
            want.append(opt.param_groups[0]["lr"])
            opt.step()
            sched.step()
        # schedule computed in f32: tiny rounding at min_lr (~1e-9) is fine
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-3, atol=1e-10)


class TestSurgery:
    def _params(self):
        cfg = FFRaftConfig(fusion="parallel", fuse_cnet=True, iters=1)
        model = FFRaft(cfg)
        b = _tiny_batch(1, 32, 32)
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(b["image1"]),
                       jnp.asarray(b["image2"]), jnp.asarray(b["mask1"]),
                       jnp.asarray(b["mask2"]), iters=1)
        return v

    def test_copy_to_branch(self):
        v = self._params()
        out = copy_to_branch({"params": v["params"]})
        fnet = out["params"]["flow_net"]["fnet"]
        np.testing.assert_array_equal(
            fnet["mask_conv1"]["kernel"], fnet["conv1"]["kernel"]
        )
        np.testing.assert_array_equal(
            fnet["mask_layer2_0"]["conv1"]["kernel"], fnet["layer2_0"]["conv1"]["kernel"]
        )

    def test_separate_lr_flow_net_tenth(self):
        """TRAIN.SEPARATE_LR: flow_net params update at lr/10 of fusion_layer
        (`ff-raft/train.py:211-233`). Checked via one SGD-like comparison:
        identical grads on two params, flow_net step must be 10x smaller."""
        from flax import traverse_util

        from focusflow_official_tpu.train.surgery import flow_net_lr_labels

        # fusion front-end mode: fusion_layer + flow_net as separate subtrees
        # (in 'parallel' mode the CCE lives inside flow_net and SEPARATE_LR
        # degenerates to a global lr/10, as in the reference)
        cfg = FFRaftConfig(fusion="conv", iters=1)
        model = FFRaft(cfg)
        b = _tiny_batch(1, 32, 32)
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(b["image1"]),
                       jnp.asarray(b["image2"]), jnp.asarray(b["mask1"]),
                       jnp.asarray(b["mask2"]), iters=1)
        params = v["params"]
        labels = flow_net_lr_labels(params)
        flat = traverse_util.flatten_dict(labels)
        assert flat[("flow_net", "fnet", "conv1", "kernel")] == "encoder"
        assert all(lbl == "trainable" for k, lbl in flat.items()
                   if k[0] == "fusion_layer" or "fusion" in k[0])

        tx = build_optimizer(1e-3, clip=1e9, weight_decay=0.0,
                             encoder_labels=labels, encoder_lr_factor=0.1)
        opt_state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, opt_state, params)
        uflat = traverse_util.flatten_dict(updates)
        flow_step = np.abs(np.asarray(
            uflat[("flow_net", "fnet", "conv1", "kernel")])).mean()
        fusion_key = next(k for k in uflat if k[0] != "flow_net")
        fusion_step = np.abs(np.asarray(uflat[fusion_key])).mean()
        # AdamW with uniform grads: |update| ~ lr, so the ratio is ~0.1
        np.testing.assert_allclose(flow_step / fusion_step, 0.1, rtol=1e-3)

    def test_freeze_labels(self):
        v = self._params()
        labels = freeze_mask_for_parallel(v["params"])
        from flax import traverse_util

        flat = traverse_util.flatten_dict(labels)
        fnet_img = flat[("flow_net", "fnet", "conv1", "kernel")]
        fnet_mask = flat[("flow_net", "fnet", "mask_conv1", "kernel")]
        gru = [v for k, v in flat.items() if "gru" in k][0]
        head = [v for k, v in flat.items() if "flow_head" in k][0]
        assert fnet_img == "frozen" and fnet_mask == "trainable"
        assert gru == "frozen" and head == "trainable"


class TestTrainStep:
    def test_loss_decreases_and_multichip(self):
        """8-virtual-device data-parallel train step; fresh-init (torch
        defaults, see nn/update.py) training must descend on a fixed batch
        (e2e smoke, SURVEY.md §4).

        Adam's second-moment warm-up produces a transient spike around
        steps 1-3 before steady descent (measured: 9.26 -> 18.2 -> ... ->
        8.4 by step 16), so the gate compares the settled tail against the
        fresh-init loss rather than step 4 vs step 0.
        """
        assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
        mesh = make_mesh(jax.devices()[:8])

        cfg = FFRaftConfig(fusion="parallel", fuse_cnet=True, iters=2,
                           compute_dtype="float32")
        model = FFRaft(cfg)
        batch = _tiny_batch(b=8, h=64, w=64)

        tx = build_optimizer(lambda _: 1e-4, clip=1.0)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in batch.items()}, tx,
        )
        state = jax.device_put(state, replicate(mesh))
        sbatch = put_batch(batch, mesh)

        loss_fn = build_sequence_loss("MixLoss", kernel_size=1, sigma=0.01, lamda=1.0)
        step = make_train_step(loss_fn, iters=cfg.iters, add_noise=False)

        losses = []
        for i in range(16):
            state, metrics = step(state, sbatch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all(), losses
        tail = float(np.mean(losses[-4:]))
        assert tail < 0.98 * losses[0], losses
        # descent is steady once past the Adam transient
        assert float(np.mean(losses[-4:])) < float(np.mean(losses[4:8])), losses

    def test_batch_stats_updated(self):
        cfg = FFRaftConfig(fusion="parallel", fuse_cnet=True, iters=1,
                           compute_dtype="float32")
        model = FFRaft(cfg)
        batch = _tiny_batch(b=1, h=32, w=32)
        tx = build_optimizer(lambda _: 1e-4)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in batch.items()}, tx,
        )
        loss_fn = build_sequence_loss("EPELoss")
        step = make_train_step(loss_fn, iters=1, add_noise=False)
        before = jax.tree.leaves(state.batch_stats)[0].copy()
        state, _ = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                        jax.random.PRNGKey(0))
        after = jax.tree.leaves(state.batch_stats)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestMultichipFamilies:
    """Data-parallel train step on the 8-virtual-device mesh for the OTHER
    two families (VERDICT r4 item 3) — FF-RAFT is covered above. FlowFormer
    is the grad-structure risk case: the reference's DDP needs
    `find_unused_parameters=True` (`ff-flowformer/common_util.py:48`);
    under GSPMD unused params take zero grads through the same all-reduce.
    """

    def test_pwcnet_multichip_step(self):
        from focusflow_official_tpu.losses import build_multiscale_loss
        from focusflow_official_tpu.models import FFPWCNet

        assert jax.device_count() >= 8
        mesh = make_mesh(jax.devices()[:8])
        cfg = FFRaftConfig(fusion="parallel", fusion_type="1x1conv",
                           compute_dtype="float32", corr_impl="xla")
        model = FFPWCNet(cfg)
        batch = _tiny_batch(b=8, h=64, w=96)
        tx = build_optimizer(lambda _: 1e-4, clip=1.0)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in batch.items()}, tx)
        state = jax.device_put(state, replicate(mesh))
        sbatch = put_batch(batch, mesh)
        loss_fn = build_multiscale_loss(
            "EPELoss", weights=[0.32, 0.08, 0.02, 0.01, 0.005],
            mode="pretrain")
        step = make_train_step(loss_fn, iters=None, add_noise=False)
        state, metrics = step(state, sbatch, jax.random.PRNGKey(1))
        jax.block_until_ready(state.params)
        assert np.isfinite(float(metrics["loss"])), metrics
        assert float(metrics["grad_norm"]) > 0.0

    def test_flowformer_multichip_step(self):
        from focusflow_official_tpu.models import FFFlowFormer, FlowFormerConfig

        assert jax.device_count() >= 8
        mesh = make_mesh(jax.devices()[:8])
        cfg = FlowFormerConfig(
            fusion="parallel", compute_dtype="float32", corr_impl="xla",
            encoder_depth=1, decoder_depth=2, cost_latent_token_num=4)
        model = FFFlowFormer(cfg)
        batch = _tiny_batch(b=8, h=64, w=96)
        tx = build_optimizer(lambda _: 1e-4, clip=1.0)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in batch.items()}, tx)
        state = jax.device_put(state, replicate(mesh))
        sbatch = put_batch(batch, mesh)
        loss_fn = build_sequence_loss("EPELoss", gamma=0.8)
        step = make_train_step(loss_fn, iters=cfg.decoder_depth,
                               add_noise=False)
        state, metrics = step(state, sbatch, jax.random.PRNGKey(1))
        jax.block_until_ready(state.params)
        assert np.isfinite(float(metrics["loss"])), metrics
        assert float(metrics["grad_norm"]) > 0.0
