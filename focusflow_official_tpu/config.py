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
        alt_corr=bool(model.get("ALT_CORR", False)),
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


def detect_family(cfg: ConfigNode) -> str:
    """Infer the model family from the YAML shape.

    The reference splits by directory (ff-raft/ff-pwcnet/ff-flowformer with
    per-family train.py); the schemas differ recognizably: FlowFormer has a
    TRAINER section + latentcostformer keys; PWC's TRAIN carries
    LOSS_MODE/LOSS_WEIGHTS (multiscale family); otherwise RAFT.
    An explicit MODEL.FAMILY always wins.
    """
    fam = cfg.MODEL.get("FAMILY")
    if fam:
        return str(fam).lower()
    if cfg.get("TRAINER") is not None or cfg.MODEL.get("cost_latent_dim") is not None:
        return "flowformer"
    if cfg.TRAIN.get("LOSS_WEIGHTS") is not None:
        return "pwcnet"
    return "raft"


def flowformer_config_from_yaml(cfg: ConfigNode, *, compute_dtype: str = "float32",
                                corr_impl: str = "auto"):
    from .models.ff_flowformer import FlowFormerConfig

    m = cfg.MODEL
    t = cfg.TRAIN
    return FlowFormerConfig(
        fusion=m.get("FUSION"),
        mask_modal=m.get("MASK_MODAL", t.get("MASK_MODAL", "point")),
        mask_channel=int(m.get("MASK_CHANNEL", t.get("MASK_CHANNEL", 3))),
        mask_dilate=int(m.get("MASK_DILATE", t.get("MASK_DILATE", 31))),
        kernel_size=int(t.get("KERNEL_SIZE", 31)),
        kernel_sigma=float(t.get("KERNEL_SIGMA", 5)),
        pe=m.get("pe", "linear"),
        encoder_latent_dim=int(m.get("encoder_latent_dim", 256)),
        query_latent_dim=int(m.get("query_latent_dim", 64)),
        cost_latent_input_dim=int(m.get("cost_latent_input_dim", 64)),
        cost_latent_token_num=int(m.get("cost_latent_token_num", 8)),
        cost_latent_dim=int(m.get("cost_latent_dim", 128)),
        cost_heads_num=int(m.get("cost_heads_num", 1)),
        encoder_depth=int(m.get("encoder_depth", 3)),
        decoder_depth=int(m.get("decoder_depth", 12)),
        patch_size=int(m.get("patch_size", 8)),
        gma=bool(m.get("gma", True)),
        vert_c_dim=int(m.get("vert_c_dim", 64)),
        cost_encoder_res=bool(m.get("cost_encoder_res", True)),
        use_mlp=bool(m.get("use_mlp", False)),
        vertical_conv=bool(m.get("vertical_conv", False)),
        only_global=bool(m.get("only_global", False)),
        add_flow_token=bool(m.get("add_flow_token", True)),
        context_concat=bool(m.get("context_concat", False)),
        feat_cross_attn=bool(m.get("feat_cross_attn", False)),
        dropout=float(m.get("dropout", 0.0)),
        compute_dtype=compute_dtype,
        corr_impl=corr_impl,
    )


def optimizer_kwargs_from_yaml(cfg: ConfigNode) -> Dict:
    """lr/weight-decay/eps/clip from OPTIMIZER+SCHEDULER (RAFT/PWC) or the
    FlowFormer TRAINER block (`ff-flowformer/config/ff_chairs.yaml:85-94`)."""
    if cfg.get("TRAINER") is not None:
        t = cfg.TRAINER
        return dict(
            lr=float(t.canonical_lr),
            weight_decay=float(t.get("adamw_decay", t.get("adam_decay", 1e-4))),
            epsilon=float(t.get("epsilon", 1e-8)),
            clip=float(t.get("clip", 1.0)),
        )
    return dict(
        lr=float(cfg.SCHEDULER.LR),
        weight_decay=float(cfg.OPTIMIZER.WEIGHT_DECAY),
        epsilon=float(cfg.OPTIMIZER.EPSILON),
        clip=float(cfg.TRAIN.get("CLIP", 1.0)),
    )


def multiscale_loss_kwargs_from_yaml(cfg: ConfigNode, sparse: bool = False) -> Dict:
    t = cfg.TRAIN
    return dict(
        loss_type=t.get("LOSS_TYPE", "EPELoss"),
        weights=[float(x) for x in t.LOSS_WEIGHTS],
        mode=t.get("LOSS_MODE", "pretrain"),
        q=float(t.get("LOSS_Q") or 0.4),
        eps=float(t.get("LOSS_EPSILON") or 0.01),
        kernel_size=int(t.get("LOSS_KERNEL_SIZE", 5)),
        sigma=float(t.get("LOSS_SIGMA", 1.7)),
        lamda=float(t.get("LOSS_LAMDA", 0.8)),
        sparse=sparse,
    )
