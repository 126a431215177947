"""Learning-rate schedules.

`one_cycle_lr` reproduces torch's OneCycleLR with `anneal_strategy='linear'`
exactly as the reference configures it
(`/root/reference/core/models/ff-raft/train.py:238-263`): total horizon is
NUM_STEPS + 100, pct_start 0.05, warm-up from max_lr/div_factor to max_lr,
then linear anneal to max_lr/(div_factor*final_div_factor).
"""

from __future__ import annotations

import jax.numpy as jnp


def one_cycle_lr(max_lr: float, total_steps: int, pct_start: float = 0.05,
                 div_factor: float = 25.0, final_div_factor: float = 1e4):
    """Returns an optax-style schedule fn: step -> lr (torch linear OneCycle)."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    # torch phase boundaries (`torch/optim/lr_scheduler.py` OneCycleLR):
    up_end = float(pct_start * total_steps) - 1.0
    down_end = float(total_steps) - 1.0

    def schedule(count):
        t = jnp.asarray(count, jnp.float32)
        pct_up = jnp.clip(t / jnp.maximum(up_end, 1e-8), 0.0, 1.0)
        lr_up = initial_lr + pct_up * (max_lr - initial_lr)
        pct_down = jnp.clip((t - up_end) / jnp.maximum(down_end - up_end, 1e-8), 0.0, 1.0)
        lr_down = max_lr + pct_down * (min_lr - max_lr)
        return jnp.where(t <= up_end, lr_up, lr_down)

    return schedule
