"""Every shipped YAML must parse through the config layer end-to-end.

The matrix mirrors the reference's 53 configs (SURVEY.md §2.3-2.5 config
rows); this test catches schema drift anywhere in it without building
models (model construction itself is covered by the family test files).
"""

import glob
import os

import pytest

from focusflow_official_tpu.config import (
    detect_family,
    flowformer_config_from_yaml,
    load_yaml_config,
    loss_kwargs_from_yaml,
    model_config_from_yaml,
    multiscale_loss_kwargs_from_yaml,
    optimizer_kwargs_from_yaml,
)

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "configs")
ALL_YAMLS = sorted(glob.glob(os.path.join(ROOT, "**", "*.yaml"), recursive=True))


def test_matrix_size():
    # 53 experiment/ablation configs (reference parity) + 3 smoke configs
    assert len(ALL_YAMLS) >= 56, len(ALL_YAMLS)


@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: os.path.relpath(p, ROOT))
def test_config_parses(path):
    cfg = load_yaml_config(path)
    family = detect_family(cfg)
    assert family in ("raft", "pwcnet", "flowformer")
    stage = cfg.TRAIN.get("STAGE", "chairs")
    if family == "flowformer":
        model_cfg = flowformer_config_from_yaml(cfg)
        assert model_cfg.decoder_depth > 0
        kw = loss_kwargs_from_yaml(cfg)
        assert kw.pop("loss_type") in ("MixLoss", "EPELoss", "CPCL")
    elif family == "pwcnet":
        model_cfg = model_config_from_yaml(cfg)
        kw = multiscale_loss_kwargs_from_yaml(cfg, sparse=stage == "kitti")
        assert kw.pop("loss_type") in ("MixLoss", "EPELoss", "CPCL")
        assert len(kw["weights"]) == 5
    else:
        model_cfg = model_config_from_yaml(cfg)
        assert model_cfg.iters > 0
        kw = loss_kwargs_from_yaml(cfg)
        assert kw.pop("loss_type") in ("MixLoss", "EPELoss", "CPCL")
    if cfg.get("OPTIMIZER") is not None or cfg.get("TRAINER") is not None:
        okw = optimizer_kwargs_from_yaml(cfg)
        assert okw["lr"] > 0 and okw["clip"] > 0
    assert int(cfg.TRAIN.NUM_STEPS) > 0
    assert cfg.TRAIN.MASK_TYPE in ("orb", "sift", "gf", "silk")
