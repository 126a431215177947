"""Evaluation CLI: `python -m focusflow_official_tpu.cli.evaluate --yaml <cfg>`.

Runs the reference validation protocol (chairs / sintel / kitti, AEPE +
keypoint-EPE + KITTI F1) against an Orbax checkpoint or an imported torch
`.pth`, mirroring `/root/reference/core/models/ff-raft/evaluate.py`.
"""

from __future__ import annotations

import argparse
import json
import os

import jax

from ..config import load_yaml_config
from ..data.datasets import KITTI, FlyingChairs, MpiSintel
from ..train import evaluate as eval_mod
from .train import DEFAULT_DATA_ROOT, build_model_and_loss, load_torch_pretrained, mask_roots


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--yaml", required=True)
    parser.add_argument("--checkpoint", required=True,
                        help="orbax dir or torch .pth/.pth.tar")
    parser.add_argument("--datasets", nargs="+", default=None,
                        help="override CRITERION.VAL_DATASET")
    parser.add_argument("--data-root", nargs="*", default=None)
    parser.add_argument("--compute-dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--corr-impl", default="auto")
    args = parser.parse_args()

    cfg = load_yaml_config(args.yaml)
    _family, _model_cfg, model, _loss, _iters = build_model_and_loss(cfg, args)

    data_root = dict(DEFAULT_DATA_ROOT)
    if args.data_root:
        for kv in args.data_root:
            k, v = kv.split("=", 1)
            data_root[k] = v
    mask_root = mask_roots(data_root)
    mask_type = cfg.TRAIN.MASK_TYPE

    # template init on tiny shapes, then load weights
    import jax.numpy as jnp
    import numpy as np

    zeros = lambda c: jnp.zeros((1, 64, 64, c), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), zeros(3), zeros(3), zeros(1), zeros(1), iters=1)

    if args.checkpoint.endswith((".pth", ".pth.tar", ".pt")):
        variables = load_torch_pretrained(args.checkpoint, dict(template))
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        variables = ckptr.restore(
            os.path.abspath(args.checkpoint),
            {"params": template["params"],
             "batch_stats": template.get("batch_stats", {})},
        )
    variables = jax.tree.map(jnp.asarray, dict(variables))

    results = {}
    for val_dataset in args.datasets or cfg.CRITERION.VAL_DATASET:
        if val_dataset == "chairs":
            ds = FlyingChairs(data_root["chairs"], mask_root["chairs"],
                              split="validation", mask_type=mask_type)
            results.update(eval_mod.validate_chairs(model, variables, ds, mask_type))
        elif val_dataset == "sintel":
            dss = {t: MpiSintel(data_root["sintel"], mask_root["sintel"], split="val",
                                dstype=t, mask_type=mask_type)
                   for t in ("clean", "final")}
            results.update(eval_mod.validate_sintel(model, variables, dss, mask_type))
        elif val_dataset == "kitti":
            ds = KITTI(data_root["kitti"], mask_root["kitti"], split="val",
                       mask_type=mask_type)
            results.update(eval_mod.validate_kitti(model, variables, ds, mask_type))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
