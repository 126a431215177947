"""pjit'd training step.

TPU-native equivalent of the reference's ~400-line `train()` hot loop
(`/root/reference/core/models/ff-raft/train.py:291-375`), redesigned:

- one jit'd `train_step` containing noise augmentation, forward (all
  refinement iterations as `lax.scan`), loss, backward, global-norm clip,
  AdamW + OneCycle — the whole step is a single XLA program, donated in
  place;
- data parallelism by sharding the batch over the mesh's `data` axis;
  gradient psum is inserted by XLA (no DDP wrapper, no GradScaler — bf16
  needs no loss scaling; the reference's `loss *= world_size` DDP
  compensation is intentionally dropped in favor of a true global-batch
  mean);
- BatchNorm running stats live in the `batch_stats` collection and are
  updated inside the step (frozen after the chairs stage via
  `FFRaftConfig.freeze_bn`).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .schedule import one_cycle_lr


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def build_optimizer(
    lr: float | Callable,
    *,
    weight_decay: float = 1e-5,
    epsilon: float = 1e-8,
    clip: float = 1.0,
    freeze_labels: Optional[Any] = None,
    encoder_labels: Optional[Any] = None,
    encoder_lr_factor: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW + global-norm clip, matching `train.py:211-214, 318`.

    - `freeze_labels`: 'frozen'/'trainable' label pytree (see
      `surgery.freeze_mask_for_parallel`) — frozen leaves get zero updates,
      the functional counterpart of `requires_grad = False`.
    - `encoder_labels` + `encoder_lr_factor`: FlowFormer's `twins_lr_factor`
      param groups (`ff-flowformer/FF_FlowFormer_Core/optimizer/__init__.py:
      22-32`): pretrained encoder params train at lr * factor.
    The global-norm clip is applied before partitioning so it stays global,
    like torch's `clip_grad_norm_(model.parameters())`.
    """

    def adamw(lr_):
        return optax.adamw(lr_, b1=0.9, b2=0.999, eps=epsilon,
                           weight_decay=weight_decay)

    if freeze_labels is None and encoder_lr_factor is None:
        return optax.chain(optax.clip_by_global_norm(clip), adamw(lr))

    # merge label trees: frozen > encoder > trainable
    import jax as _jax

    def merge(frozen_lbl, enc_lbl):
        if frozen_lbl == "frozen":
            return "frozen"
        return enc_lbl

    if freeze_labels is not None and encoder_labels is not None:
        labels = _jax.tree.map(merge, freeze_labels, encoder_labels)
    elif freeze_labels is not None:
        labels = freeze_labels
    else:
        labels = encoder_labels

    transforms = {"trainable": adamw(lr), "frozen": optax.set_to_zero()}
    if encoder_lr_factor is not None:
        scaled = (lambda c: lr(c) * encoder_lr_factor) if callable(lr) else lr * encoder_lr_factor
        transforms["encoder"] = adamw(scaled)
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.multi_transform(transforms, labels),
    )


def create_train_state(model, rng, example_batch: Dict, tx) -> TrainState:
    variables = model.init(
        rng,
        example_batch["image1"],
        example_batch["image2"],
        example_batch.get("mask1"),
        example_batch.get("mask2"),
        iters=1,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


def make_train_step(
    loss_function: Callable,
    iters: int,
    add_noise: bool = True,
    noise_max_std: float = 5.0,
    device_augmentor: Optional[Callable] = None,
):
    """Build the jit-able train step (donate the state for in-place update).

    loss_function(flow_preds, flow_gt, valid, mask) -> (loss, metrics); the
    noise augmentation reproduces `train.py:304-307` (one std per step,
    clamp to [0, 255]).

    device_augmentor: optional `data.device_aug.DeviceFlowAugmentor` — the
    batch then arrives as RAW full frames and jitter/eraser/warp/crop run
    inside this jit'd step (the single host core caps the CPU augmentor at
    ~15 samples/s; BENCH.md round 3).
    """

    def train_step(state: TrainState, batch: Dict, rng) -> tuple:
        rng_aug, rng_noise1, rng_noise2, rng_std, rng_drop = jax.random.split(rng, 5)
        if device_augmentor is not None:
            batch = device_augmentor(rng_aug, batch)
        img1, img2 = batch["image1"], batch["image2"]
        if add_noise:
            stdv = jax.random.uniform(rng_std, (), minval=0.0, maxval=noise_max_std)
            img1 = jnp.clip(img1 + stdv * jax.random.normal(rng_noise1, img1.shape), 0.0, 255.0)
            img2 = jnp.clip(img2 + stdv * jax.random.normal(rng_noise2, img2.shape), 0.0, 255.0)

        def loss_fn(params):
            outs, new_mstate = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                img1, img2, batch.get("mask1"), batch.get("mask2"),
                iters=iters, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng_drop},
            )
            loss, metrics = loss_function(
                outs, batch["flow"], batch["valid"], batch.get("mask1")
            )
            return loss, (metrics, new_mstate)

        (loss, (metrics, new_mstate)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads)
        new_state = new_state.replace(batch_stats=new_mstate.get("batch_stats", {}))
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))
