from .mesh import make_mesh, shard_batch, replicate
from .schedule import one_cycle_lr
from .loop import TrainState, create_train_state, make_train_step
from .surgery import copy_to_branch, drop_first_convs, freeze_mask_for_parallel

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "one_cycle_lr",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "copy_to_branch",
    "drop_first_convs",
    "freeze_mask_for_parallel",
]
