"""Model configuration dataclasses mirroring the reference YAML schema.

The reference drives model construction from a nested argparse.Namespace
parsed out of YAML (GLOBAL/TRAIN/MODEL/... sections — see
`/root/reference/core/models/ff-raft/common.py:32-42` and
`config/experiment/ffraft_chairs_orb.yaml`). Here the model-relevant subset
is a typed, hashable dataclass so it can be a static argument to jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class FFRaftConfig:
    # MODEL section
    fusion: Optional[str] = "parallel"  # None | 'parallel' ('attention'/'conv' later)
    fusion_type: str = "1x1conv"  # '1x1conv'|'concat'|'SA'|'CA'|'1x1conv-unidirection'
    fusion_channel: int = 256
    small: bool = False
    abandon_fnet: bool = False
    fuse_cnet: bool = False
    iters: int = 12
    dropout: float = 0.0
    freeze_bn: bool = False  # BatchNorm frozen after the chairs stage (`train.py:192-193`)

    # TRAIN section (mask handling)
    mask_modal: str = "point"  # 'point'|'neighborE'|'neighborG'|'context'|'frame'
    mask_channel: int = 3
    mask_dilate: int = 31
    kernel_size: int = 31
    kernel_sigma: float = 5.0

    # MODEL.ALT_CORR: memory-lean on-the-fly windowed correlation
    # (`ops/corr.py::alternate_corr_lookup`; ref `corr.py:63-91`)
    alt_corr: bool = False
    alt_corr_chunk: int = 2048

    # implementation knobs (TPU-side, no reference analog)
    corr_impl: str = "xla"  # 'auto' | 'xla' | 'pallas'
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
