from .sequence import epe_loss, cpcl_loss, mix_loss, build_sequence_loss
from .multiscale import (
    multiscale_epe_loss,
    multiscale_cpcl_loss,
    multiscale_mix_loss,
    build_multiscale_loss,
    sparse_max_pool,
)

__all__ = [
    "epe_loss",
    "cpcl_loss",
    "mix_loss",
    "build_sequence_loss",
    "multiscale_epe_loss",
    "multiscale_cpcl_loss",
    "multiscale_mix_loss",
    "build_multiscale_loss",
    "sparse_max_pool",
]
