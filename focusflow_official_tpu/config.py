"""YAML experiment config: the reference schema, typed.

Parses the reference's flat YAML schema (sections
GLOBAL/TRAIN/MODEL/CRITERION/OPTIMIZER/SCHEDULER —
`/root/reference/core/models/ff-raft/common.py:32-42`, example
`config/experiment/ffraft_chairs_orb.yaml`) into a dot-accessible namespace,
plus adapters that derive the typed model config (`FFRaftConfig`) and
trainer hyperparameters. Reference YAML files are drop-in usable.
"""

from __future__ import annotations

import types
from typing import Any, Dict, Optional

import yaml

from .models.config import FFRaftConfig


class ConfigNode(types.SimpleNamespace):
    def get(self, name: str, default: Any = None) -> Any:
        return getattr(self, name, default)

    def to_dict(self) -> Dict:
        out = {}
        for k, v in vars(self).items():
            out[k] = v.to_dict() if isinstance(v, ConfigNode) else v
        return out


def _to_node(obj: Any) -> Any:
    if isinstance(obj, dict):
        return ConfigNode(**{k: _to_node(v) for k, v in obj.items()})
    return obj


def load_yaml_config(path: str) -> ConfigNode:
    with open(path) as f:
        raw = yaml.safe_load(f)
    return _to_node(raw)


def model_config_from_yaml(cfg: ConfigNode, *, stage_override: Optional[str] = None,
                           compute_dtype: str = "float32",
                           corr_impl: str = "auto") -> FFRaftConfig:
    """Derive the static FFRaftConfig from a parsed reference YAML."""
    model = cfg.MODEL
    train = cfg.TRAIN
    stage = stage_override or train.get("STAGE", "chairs")
    return FFRaftConfig(
        fusion=model.get("FUSION"),
        fusion_type=model.get("FUSION_TYPE", "1x1conv"),
        fusion_channel=model.get("FUSION_CHANNEL", 256),
        small=bool(model.get("SMALL", False)),
        abandon_fnet=bool(model.get("ABANDON_FNET", False)),
        fuse_cnet=bool(model.get("FUSE_CNET", False)),
        iters=int(model.get("ITERS", 12)),
        dropout=float(model.get("DROPOUT", 0.0)),
        freeze_bn=stage != "chairs",  # `train.py:192-193`
        mask_modal=train.get("MASK_MODAL", "point"),
        mask_channel=int(train.get("MASK_CHANNEL", 3)),
        mask_dilate=int(train.get("MASK_DILATE", 31)),
        kernel_size=int(train.get("KERNEL_SIZE", 31)),
        kernel_sigma=float(train.get("KERNEL_SIGMA", 5)),
        compute_dtype=compute_dtype,
        corr_impl=corr_impl,
    )


def loss_kwargs_from_yaml(cfg: ConfigNode) -> Dict:
    t = cfg.TRAIN
    return dict(
        loss_type=t.get("LOSS_TYPE", "EPELoss"),
        gamma=float(t.get("LOSS_GAMMA", 0.8)),
        max_flow=float(t.get("MAX_FLOW", 400)),
        kernel_size=int(t.get("LOSS_KERNEL_SIZE", 5)),
        sigma=float(t.get("LOSS_SIGMA", 1.7)),
        lamda=float(t.get("LOSS_LAMDA", 0.8)),
    )
