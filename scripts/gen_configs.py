#!/usr/bin/env python
"""Generate the experiment config matrix under configs/.

Reproduces the reference experiment grid (SURVEY.md §2.3-2.5 config rows:
FF-RAFT chairs x {orb,sift,gf,silk}, things, C+T+S, C+T+K and vanilla-RAFT
baselines; FF-PWC chairs/things/sintel/kitti; FF-FlowFormer chairs/things/
sintel/kitti; fusion/mask-modal/loss ablations) in our (reference-compatible)
YAML schema. Run `python scripts/gen_configs.py` after editing.
"""

from __future__ import annotations

import os
import sys

import yaml

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def raft_cfg(name, *, stage="chairs", steps=250000, batch=10, image=(368, 496),
             lr=4e-4, mask_type="orb", fusion="parallel", fusion_type="1x1conv",
             mask_modal="point", loss=("MixLoss", 1, 0.01, 1.0), pretrain=None,
             load_module=None, load_to_branch=False, freeze=False, iters=12,
             fuse_cnet=True, small=False, val=("chairs", "sintel")):
    k, sigma, lamda = loss[1], loss[2], loss[3]
    return {
        "GLOBAL": {"NAME": name, "MIXED_PRECISION": False, "SEED": 1234,
                   "CUDNN_ENABLED": True, "ALLOW_TF32": True, "NUM_THREADS": 8,
                   "NUM_WORKERS": 8},
        "TRAIN": {"STAGE": stage, "RESTORE_CHECKPOINT": None, "ADD_NOISE": True,
                  "NUM_STEPS": steps, "BATCH_SIZE": batch,
                  "IMAGE_SIZE": list(image), "SEPARATE_LR": False,
                  "LOSS_TYPE": loss[0], "MASK_TYPE": mask_type,
                  "MASK_MODAL": mask_modal, "MASK_CHANNEL": 3, "MASK_DILATE": 31,
                  "KERNEL_SIZE": 31, "KERNEL_SIGMA": 5, "CLIP": 1.0,
                  "LOSS_GAMMA": 0.8, "MAX_FLOW": 400, "LOSS_KERNEL_SIZE": k,
                  "LOSS_SIGMA": sigma, "LOSS_LAMDA": lamda},
        "MODEL": {"FUSION": fusion, "FUSION_TYPE": fusion_type,
                  "FUSION_CHANNEL": 256, "PRETRAIN": pretrain,
                  "LOAD_MODULE": load_module,
                  "LOAD_MODULE_TO_BRANCH": load_to_branch,
                  "FREEZE_MODULE": freeze, "SMALL": small,
                  "ABANDON_FNET": False, "FUSE_CNET": fuse_cnet, "ITERS": iters,
                  "DROPOUT": 0.0, "ALT_CORR": False},
        "CRITERION": {"VAL_DATASET": list(val)},
        "OPTIMIZER": {"LR": lr, "WEIGHT_DECAY": 1e-5, "EPSILON": 1e-8},
        "SCHEDULER": {"LR": lr},
    }


def pwc_cfg(name, *, stage="chairs", steps=1200000, batch=8, lr=1e-4,
            mask_type="orb", mode="pretrain", load_module=None,
            fusion="parallel", loss_type="MixLoss",
            val=("chairs", "sintel")):
    return {
        "GLOBAL": {"NAME": name, "MIXED_PRECISION": False, "SEED": 1234,
                   "CUDNN_ENABLED": True, "ALLOW_TF32": True, "NUM_THREADS": 16,
                   "NUM_WORKERS": 16},
        "TRAIN": {"STAGE": stage, "PRETRAIN": None, "RESTORE_CHECKPOINT": None,
                  "ADD_NOISE": True, "NUM_STEPS": steps, "BATCH_SIZE": batch,
                  "IMAGE_SIZE": [368, 496], "SEPARATE_LR": False,
                  "LOSS_TYPE": loss_type, "MASK_TYPE": mask_type,
                  "MASK_MODAL": "point", "MASK_CHANNEL": 3, "MASK_DILATE": 31,
                  "KERNEL_SIZE": 31, "KERNEL_SIGMA": 5, "CLIP": 1.0,
                  "MAX_FLOW": 400, "LOSS_MODE": mode,
                  "LOSS_WEIGHTS": [0.005, 0.01, 0.02, 0.08, 0.32],
                  "LOSS_Q": None if mode == "pretrain" else 0.4,
                  "LOSS_EPSILON": None if mode == "pretrain" else 0.01,
                  "LOSS_KERNEL_SIZE": 1, "LOSS_SIGMA": 0.01, "LOSS_LAMDA": 1},
        "MODEL": {"FUSION": fusion, "FUSION_TYPE": "1x1conv",
                  "FUSION_CHANNEL": None, "LOAD_MODULE": load_module,
                  "FREEZE_MODULE": False, "DROPOUT": 0.0, "ALT_CORR": False},
        "CRITERION": {"VAL_DATASET": list(val)},
        "OPTIMIZER": {"LR": lr, "WEIGHT_DECAY": 1e-5, "EPSILON": 1e-8},
        "SCHEDULER": {"LR": lr},
    }


def flowformer_cfg(name, *, stage="chairs", steps=250000, batch=6, lr=2.5e-4,
                   mask_type="orb", load_former=None, fusion="parallel",
                   wd=1e-4, val=("chairs", "sintel")):
    return {
        "GLOBAL": {"NAME": name, "MIXED_PRECISION": False, "SEED": 1234,
                   "CUDNN_ENABLED": True, "ALLOW_TF32": True, "NUM_THREADS": 16,
                   "NUM_WORKERS": 12},
        "TRAIN": {"STAGE": stage, "RESTORE_CHECKPOINT": None, "ADD_NOISE": True,
                  "NUM_STEPS": steps, "BATCH_SIZE": batch,
                  "IMAGE_SIZE": [368, 496], "SEPARATE_LR": False,
                  "LOSS_TYPE": "MixLoss", "MASK_TYPE": mask_type,
                  "KERNEL_SIZE": 31, "KERNEL_SIGMA": 5, "LOSS_GAMMA": 0.8,
                  "MAX_FLOW": 400, "LOSS_KERNEL_SIZE": 1, "LOSS_SIGMA": 0.01,
                  "LOSS_LAMDA": 1},
        "MODEL": {"FUSION": fusion, "MASK_MODAL": "point",
                  "MASK_CHANNEL": 3, "MASK_DILATE": 31,
                  "pe": "linear", "dropout": 0.0, "encoder_latent_dim": 256,
                  "query_latent_dim": 64, "cost_latent_input_dim": 64,
                  "cost_latent_token_num": 8, "cost_latent_dim": 128,
                  "cost_heads_num": 1, "pretrain": True,
                  "context_concat": False, "encoder_depth": 3,
                  "feat_cross_attn": False, "patch_size": 8, "gma": "GMA",
                  "vert_c_dim": 64, "cost_encoder_res": True,
                  "only_global": False, "add_flow_token": True,
                  "use_mlp": False, "vertical_conv": False,
                  "decoder_depth": 12, "pretrain_model": None,
                  "load_former": load_former, "ALT_CORR": False},
        "CRITERION": {"VAL_DATASET": list(val)},
        "TRAINER": {"scheduler": "OneCycleLR", "optimizer": "adamw",
                    "canonical_lr": lr, "adamw_decay": wd, "clip": 1.0,
                    "num_steps": steps, "epsilon": 1e-8,
                    "anneal_strategy": "linear"},
    }


def main():
    configs = {}

    # --- FF-RAFT experiments (reference config/experiment/*)
    for mt in ("orb", "sift", "gf", "silk"):
        configs[f"ff-raft/experiment/ffraft_chairs_{mt}.yaml"] = raft_cfg(
            f"ffraft-chairs-{mt}", mask_type=mt,
            load_module="pretrain/raft-chairs.pth")
    configs["ff-raft/experiment/ffraft_things.yaml"] = raft_cfg(
        "ffraft-things", stage="things", steps=200000, batch=6, lr=1.25e-4,
        pretrain="pretrain/ffraft-chairs.pth")
    configs["ff-raft/experiment/ffraft_CTS.yaml"] = raft_cfg(
        "ffraft-CTS", stage="sintel", steps=200000, batch=6, lr=1.25e-4,
        pretrain="pretrain/ffraft-things.pth", val=("sintel",))
    configs["ff-raft/experiment/ffraft_CTK.yaml"] = raft_cfg(
        "ffraft-CTK", stage="kitti", steps=100000, batch=6, lr=1e-4,
        pretrain="pretrain/ffraft-sintel.pth", val=("kitti",))
    configs["ff-raft/experiment/raft_CTS.yaml"] = raft_cfg(
        "raft-CTS", stage="sintel", steps=200000, batch=6, lr=1.25e-4,
        fusion=None, loss=("EPELoss", 1, 0.01, 1.0), val=("sintel",))
    configs["ff-raft/experiment/raft_CTK.yaml"] = raft_cfg(
        "raft-CTK", stage="kitti", steps=100000, batch=6, lr=1e-4,
        fusion=None, loss=("EPELoss", 1, 0.01, 1.0), val=("kitti",))

    # --- FF-RAFT ablations
    for ft in ("CA", "SA", "concat", "1x1conv-unidirection"):
        tag = {"CA": "CA", "SA": "SA", "concat": "conv",
               "1x1conv-unidirection": "conv-uni"}[ft]
        configs[f"ff-raft/ablation/fusion/{tag}.yaml"] = raft_cfg(
            f"ablation-fusion-{tag}", fusion_type=ft,
            load_module="pretrain/raft-chairs.pth")
    for modal in ("point", "frame", "neighborE", "neighborG"):
        configs[f"ff-raft/ablation/input_mask/{modal}.yaml"] = raft_cfg(
            f"ablation-mask-{modal}", mask_modal=modal,
            load_module="pretrain/raft-chairs.pth")
    for lamda, k, sigma in ((0.1, 1, 0.01), (1, 1, 0.01), (10, 1, 0.01),
                            (100, 1, 0.01), (1, 5, 0.8), (1, 9, 1.5),
                            (1, 13, 2), (1, 21, 3.5)):
        configs[f"ff-raft/ablation/loss/mixloss_{lamda}_{k}_{sigma}.yaml"] = raft_cfg(
            f"ablation-mixloss-{lamda}-{k}-{sigma}",
            loss=("MixLoss", k, sigma, lamda),
            load_module="pretrain/raft-chairs.pth")
    configs["ff-raft/ablation/loss/ffraft_cpcl.yaml"] = raft_cfg(
        "ablation-cpcl", loss=("CPCL", 1, 0.01, 1.0),
        load_module="pretrain/raft-chairs.pth")
    configs["ff-raft/ablation/loss/ffraft_epeloss.yaml"] = raft_cfg(
        "ablation-epeloss", loss=("EPELoss", 1, 0.01, 1.0),
        load_module="pretrain/raft-chairs.pth")
    configs["ff-raft/ablation/train/ffraft_start.yaml"] = raft_cfg(
        "ablation-train-start")
    configs["ff-raft/ablation/train/ffraft_finetune_load_branch.yaml"] = raft_cfg(
        "ablation-train-load-branch", load_module="pretrain/raft-chairs.pth",
        load_to_branch=True)
    configs["ff-raft/ablation/train/ffraft_prompt_tune.yaml"] = raft_cfg(
        "ablation-train-prompt-tune", load_module="pretrain/raft-chairs.pth",
        freeze=True)

    # --- FF-PWC experiments (reference ff-pwcnet/config/*, 12 yamls)
    configs["ff-pwcnet/pwc_chairs.yaml"] = pwc_cfg(
        "pwcnet-chairs", fusion=None, loss_type="EPELoss", steps=250000,
        lr=4e-4)
    configs["ff-pwcnet/pwc_things.yaml"] = pwc_cfg(
        "pwcnet-things", fusion=None, loss_type="EPELoss", stage="things",
        steps=500000, lr=1e-4, mode="robust")
    # step-count/lr chairs variants (`config/ffpwc_chairs{,_500k,_1200k}.yaml`)
    configs["ff-pwcnet/ffpwc_chairs.yaml"] = pwc_cfg(
        "ffpwcnet-chairs-lr4e-4_250k", steps=250000, lr=4e-4,
        load_module="pretrain/pwcnet-chairs.pth")
    configs["ff-pwcnet/ffpwc_chairs_500k.yaml"] = pwc_cfg(
        "ffpwcnet-chairs-lr1e-4_500k", steps=500000,
        load_module="pretrain/pwcnet-chairs.pth")
    for mt in ("orb", "gf", "sift", "silk"):
        configs[f"ff-pwcnet/ffpwc_chairs_{mt}_1200k.yaml"] = pwc_cfg(
            f"ffpwcnet-chairs-{mt}-1200k", mask_type=mt,
            load_module="pretrain/pwcnet-chairs.pth")
    configs["ff-pwcnet/ffpwc_things_1e-4.yaml"] = pwc_cfg(
        "ffpwcnet-things-1e-4", stage="things", steps=500000, lr=1e-4,
        mode="robust")
    configs["ff-pwcnet/ffpwc_things.yaml"] = pwc_cfg(
        "ffpwcnet-things", stage="things", steps=500000, lr=1e-4, mode="robust")
    configs["ff-pwcnet/ffpwc_sintel.yaml"] = pwc_cfg(
        "ffpwcnet-sintel", stage="sintel", steps=500000, lr=5e-5, mode="robust",
        val=("sintel",))
    configs["ff-pwcnet/ffpwc_kitti.yaml"] = pwc_cfg(
        "ffpwcnet-kitti", stage="kitti", steps=500000, lr=5e-5, mode="robust",
        val=("kitti",))

    # --- FF-FlowFormer experiments (reference ff-flowformer/config/*)
    for mt in ("orb", "gf", "sift", "silk"):
        suffix = "" if mt == "orb" else f"_{mt}"
        configs[f"ff-flowformer/ff_chairs{suffix}.yaml"] = flowformer_cfg(
            f"ff-flowformer-chairs-{mt}", mask_type=mt,
            load_former="pretrain/chairs.pth")
    configs["ff-flowformer/ff_things.yaml"] = flowformer_cfg(
        "ff-flowformer-things", stage="things", steps=200000, batch=6, lr=1.25e-4)
    configs["ff-flowformer/ff_sintel.yaml"] = flowformer_cfg(
        "ff-flowformer-sintel", stage="sintel", steps=200000, batch=6,
        lr=1.25e-4, val=("sintel",))
    configs["ff-flowformer/ff_kitti.yaml"] = flowformer_cfg(
        "ff-flowformer-kitti", stage="kitti", steps=100000, batch=6, lr=1e-4,
        val=("kitti",))
    configs["ff-flowformer/ff_things_wd1e-5.yaml"] = flowformer_cfg(
        "ff-flowformer-things-wd1e-5", stage="things", steps=250000, batch=6,
        lr=2.5e-4, wd=1e-5)
    # vanilla FlowFormer baselines (`config/{chairs,sintel,kitti}.yaml`)
    configs["ff-flowformer/chairs.yaml"] = flowformer_cfg(
        "flowformer-chairs", steps=120000, fusion=None)
    configs["ff-flowformer/sintel.yaml"] = flowformer_cfg(
        "flowformer-sintel", stage="sintel", steps=120000, lr=1.25e-4,
        fusion=None, val=("sintel",))
    configs["ff-flowformer/kitti.yaml"] = flowformer_cfg(
        "flowformer-kitti", stage="kitti", steps=50000, lr=1e-4,
        fusion=None, val=("kitti",))

    for rel, cfg in configs.items():
        path = os.path.join(OUT, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
    print(f"wrote {len(configs)} configs under {OUT}")


if __name__ == "__main__":
    main()
