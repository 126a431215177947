"""Training CLI: `python -m focusflow_official_tpu.cli.train --yaml <cfg>`.

The reference's per-model `train.py` interface (`--yaml <config> --gpus ...`,
`/root/reference/core/models/ff-raft/train.py:407-419`) as ONE unified
trainer: the YAML (same schema, reference configs are drop-in) selects the
model family, stage curriculum, loss, and optimizer. `--gpus` is accepted
and ignored (device selection is the JAX runtime's job); multi-chip scaling
comes from the mesh, not process spawning.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    detect_family,
    flowformer_config_from_yaml,
    load_yaml_config,
    loss_kwargs_from_yaml,
    model_config_from_yaml,
    multiscale_loss_kwargs_from_yaml,
    optimizer_kwargs_from_yaml,
)
from ..data.datasets import KITTI, FlyingChairs, MpiSintel, fetch_dataset
from ..data.loader import Loader
from ..losses import build_multiscale_loss, build_sequence_loss
from ..models import FFPWCNet, FFRaft, PWCNet
from ..models.ff_flowformer import FFFlowFormer, FlowFormer
from ..train import evaluate as eval_mod
from ..train.checkpoints import CheckpointManager, save_params_only
from ..train.loop import build_optimizer, create_train_state, make_train_step
from ..train.mesh import make_mesh, put_batch, replicate
from ..train.metrics import MetricsLogger
from ..train.schedule import one_cycle_lr
from ..train.surgery import copy_to_branch, drop_first_convs, freeze_mask_for_parallel
from ..compat.torch_import import torch_state_dict_to_variables

DEFAULT_DATA_ROOT = {
    "chairs": "data/FlyingChairs_release",
    "things": "data/FlyingThings3D",
    "sintel": "data/Sintel-custom",
    "kitti": "data/KITTI-custom",
}


def mask_roots(data_root: Dict[str, str]) -> Dict[str, str]:
    return {k: os.path.join(os.path.dirname(v) or ".", "mask", os.path.basename(v))
            for k, v in data_root.items()}


def load_torch_pretrained(path: str, template, *, prefix: str = "", backend: bool = False,
                          strict: bool = True):
    """Load a reference `.pth`/`.pth.tar` into our variable tree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    if backend:
        sd = drop_first_convs(sd)
    return torch_state_dict_to_variables(sd, template, strict=strict, prefix=prefix)


def build_model_and_loss(cfg, args):
    """Dispatch the model family + loss family from the YAML schema.

    Replaces the reference's three near-identical per-family train.py copies
    (SURVEY.md §2.7) with one trainer.
    """
    family = detect_family(cfg)
    stage = cfg.TRAIN.get("STAGE", "chairs")
    if family == "flowformer":
        model_cfg = flowformer_config_from_yaml(
            cfg, compute_dtype=args.compute_dtype, corr_impl=args.corr_impl
        )
        model = (FFFlowFormer if model_cfg.fusion == "parallel" else FlowFormer)(model_cfg)
        kw = loss_kwargs_from_yaml(cfg)
        loss_fn = build_sequence_loss(kw.pop("loss_type"), **kw)
        iters = model_cfg.decoder_depth
    elif family == "pwcnet":
        model_cfg = model_config_from_yaml(
            cfg, compute_dtype=args.compute_dtype, corr_impl=args.corr_impl
        )
        model = (FFPWCNet(model_cfg) if model_cfg.fusion == "parallel"
                 else PWCNet())
        kw = multiscale_loss_kwargs_from_yaml(cfg, sparse=stage == "kitti")
        loss_fn = build_multiscale_loss(kw.pop("loss_type"), **kw)
        iters = None
    else:
        model_cfg = model_config_from_yaml(
            cfg, compute_dtype=args.compute_dtype, corr_impl=args.corr_impl
        )
        model = FFRaft(model_cfg)
        kw = loss_kwargs_from_yaml(cfg)
        loss_fn = build_sequence_loss(kw.pop("loss_type"), **kw)
        iters = model_cfg.iters
    return family, model_cfg, model, loss_fn, iters


def train(args) -> int:
    if args.corr_impl == "pallas":
        from ..ops.pallas_lookup import pallas_lookup_supported

        if not pallas_lookup_supported():
            raise SystemExit(
                "--corr-impl pallas: the fused Pallas lookup kernel is not "
                "available on this backend; use --corr-impl auto/mxu/xla."
            )
    cfg = load_yaml_config(args.yaml)
    family, model_cfg, model, loss_fn, model_iters = build_model_and_loss(cfg, args)
    seed = int(cfg.GLOBAL.get("SEED", 1234))

    mesh = make_mesh()
    n_proc = jax.process_count()
    logger = MetricsLogger(args.log_dir, args.yaml, cfg.GLOBAL.get("NAME", "run"))
    logger.info(f"experiment: {cfg.GLOBAL.get('NAME')}  devices: {jax.device_count()}")

    # ---- data
    data_root = dict(DEFAULT_DATA_ROOT)
    if args.data_root:
        for kv in args.data_root:
            k, v = kv.split("=", 1)
            data_root[k] = v
    mask_root = mask_roots(data_root)
    stage = cfg.TRAIN.STAGE
    train_ds = "C+T+S" if stage == "sintel" else None
    dataset = fetch_dataset(
        data_root, mask_root, stage=stage,
        image_size=tuple(cfg.TRAIN.IMAGE_SIZE), mask_type=cfg.TRAIN.MASK_TYPE,
        train_ds=train_ds, seed=seed, no_aug=args.device_aug,
    )
    device_aug = None
    if args.device_aug:
        # on-device augmentation (data/device_aug.py): the loader ships RAW
        # frames, the jit'd step does jitter/eraser/warp/crop — the single
        # host core caps the CPU augmentor at ~15 samples/s (BENCH.md r3).
        # Every stage attaches its recipe table (dense and, for the
        # sintel/kitti mixes, sparse rows dispatched per sample).
        from ..data.device_aug import DeviceFlowAugmentor

        recipes = getattr(dataset, "device_recipes", None)
        assert recipes, f"stage {stage} attached no device recipes"
        device_aug = DeviceFlowAugmentor(
            tuple(cfg.TRAIN.IMAGE_SIZE), recipes=recipes)
    # round the global batch up to a device multiple so the leading axis
    # shards evenly over the mesh (the reference's BATCH_SIZE//world_size
    # silently drops the remainder instead — `core/datasets.py:306`)
    n_dev = jax.device_count()
    batch_size = -(-int(cfg.TRAIN.BATCH_SIZE) // n_dev) * n_dev
    if batch_size != int(cfg.TRAIN.BATCH_SIZE):
        logger.info(f"batch size {cfg.TRAIN.BATCH_SIZE} -> {batch_size} "
                    f"(multiple of {n_dev} devices)")
    loader = Loader(
        dataset, batch_size, seed=seed,
        num_workers=int(cfg.GLOBAL.get("NUM_WORKERS", 4)),
        process_index=jax.process_index(), process_count=n_proc,
    )
    logger.info(f"training with {len(dataset)} image pairs")

    # ---- model + optimizer
    num_steps = int(cfg.TRAIN.NUM_STEPS)
    opt_kwargs = optimizer_kwargs_from_yaml(cfg)
    schedule = one_cycle_lr(opt_kwargs.pop("lr"), num_steps + 100, pct_start=0.05)
    clip = opt_kwargs.pop("clip")
    freeze_labels = None

    example = next(iter(loader.batches()))
    example = {k: jnp.asarray(v) for k, v in example.items()}
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)

    twins_factor = None
    if cfg.get("TRAINER") is not None and cfg.TRAINER.get("twins_lr_factor"):
        twins_factor = float(cfg.TRAINER.twins_lr_factor)
    separate_lr = bool(cfg.TRAIN.get("SEPARATE_LR", False))
    tx = build_optimizer(schedule, clip=clip, freeze_labels=freeze_labels, **opt_kwargs)
    state = create_train_state(model, init_rng, example, tx)
    if twins_factor is not None or separate_lr:
        from ..train.surgery import encoder_lr_labels, flow_net_lr_labels

        if separate_lr:  # flow_net at lr/10 (`ff-raft/train.py:211-233`)
            labels, factor = flow_net_lr_labels(state.params), 0.1
        else:
            labels, factor = encoder_lr_labels(state.params), twins_factor
        tx = build_optimizer(
            schedule, clip=clip, freeze_labels=freeze_labels,
            encoder_labels=labels, encoder_lr_factor=factor, **opt_kwargs,
        )
        state = state.replace(tx=tx, opt_state=tx.init(state.params))

    # pretrained / transfer loads (reference `ff_raft.py:112-118`, `raft.py:115-148`)
    template = {"params": state.params, "batch_stats": state.batch_stats}
    if cfg.MODEL.get("PRETRAIN"):
        v = load_torch_pretrained(cfg.MODEL.PRETRAIN, template)
        state = state.replace(params=v["params"], batch_stats=v["batch_stats"])
    if cfg.MODEL.get("LOAD_MODULE"):
        prefix = "flow_net." if family == "raft" else ""
        v = load_torch_pretrained(
            cfg.MODEL.LOAD_MODULE, template, prefix=prefix, strict=False
        )
        state = state.replace(params=v["params"], batch_stats=v["batch_stats"])
        if cfg.MODEL.get("LOAD_MODULE_TO_BRANCH"):
            v = copy_to_branch({"params": state.params})
            state = state.replace(params=v["params"])
    if cfg.MODEL.get("load_former"):  # FlowFormer transfer load
        v = load_torch_pretrained(cfg.MODEL.load_former, template, strict=False)
        state = state.replace(params=v["params"], batch_stats=v["batch_stats"])
    if cfg.MODEL.get("FREEZE_MODULE"):
        freeze_labels = freeze_mask_for_parallel(state.params)
        tx = build_optimizer(schedule, clip=clip, freeze_labels=freeze_labels,
                             **opt_kwargs)
        state = state.replace(tx=tx, opt_state=tx.init(state.params))

    ckpt = CheckpointManager(os.path.join(logger.log_dir, "checkpoints"))
    start_step = 0
    if cfg.TRAIN.get("RESTORE_CHECKPOINT"):
        restore_dir = cfg.TRAIN.RESTORE_CHECKPOINT
        state, start_step = CheckpointManager(restore_dir).restore(state)
        logger.info(f"restored checkpoint step {start_step} from {restore_dir}")

    # replicate state over the mesh; batches get sharded over `data`
    state = jax.device_put(state, replicate(mesh))

    step_fn = make_train_step(loss_fn, iters=model_iters,
                              add_noise=bool(cfg.TRAIN.get("ADD_NOISE", False)),
                              device_augmentor=device_aug)

    val_freq = args.val_freq
    total = start_step
    profiling = False
    for batch in loader.batches(start_step=total):
        if total >= num_steps:
            break
        # jax.profiler trace of steps [profile_start, profile_start+profile_steps)
        if args.profile_dir and total == args.profile_start and not profiling:
            jax.profiler.start_trace(args.profile_dir)
            profiling = True
        rng, step_rng = jax.random.split(rng)
        batch = put_batch(batch, mesh)
        state, metrics = step_fn(state, batch, step_rng)
        if jax.process_index() == 0:
            logger.push({k: float(v) for k, v in metrics.items()})
        if profiling and total >= args.profile_start + args.profile_steps - 1:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            profiling = False
            logger.info(f"profiler trace written to {args.profile_dir}")

        total += 1
        if total % val_freq == 0 and jax.process_index() == 0:
            ckpt.save(total, state)
            results = run_validation(cfg, model, state, data_root, mask_root, logger)
            logger.write_dict(results, prefix="val/")

    # final validation + params-only export (reference `train.py:377-398`)
    if jax.process_index() == 0:
        results = run_validation(cfg, model, state, data_root, mask_root, logger)
        logger.write_dict(results, prefix="final/")
        ckpt.save(total, state)
        ckpt.wait()
        save_params_only(
            os.path.join(logger.log_dir, f"{cfg.GLOBAL.get('NAME','model')}_final"),
            state.params, state.batch_stats,
        )
        logger.close()
    return 0


def run_validation(cfg, model, state, data_root, mask_root, logger=None) -> Dict:
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mask_type = cfg.TRAIN.MASK_TYPE
    results: Dict = {}
    for val_dataset in cfg.CRITERION.VAL_DATASET:
        try:
            if val_dataset == "chairs":
                ds = FlyingChairs(data_root["chairs"], mask_root["chairs"],
                                  split="validation", mask_type=mask_type)
                results.update(eval_mod.validate_chairs(model, variables, ds, mask_type))
            elif val_dataset == "sintel":
                dss = {t: MpiSintel(data_root["sintel"], mask_root["sintel"],
                                    split="val", dstype=t, mask_type=mask_type)
                       for t in ("clean", "final")}
                results.update(eval_mod.validate_sintel(model, variables, dss, mask_type))
            elif val_dataset == "kitti":
                ds = KITTI(data_root["kitti"], mask_root["kitti"], split="val",
                           mask_type=mask_type)
                results.update(eval_mod.validate_kitti(model, variables, ds, mask_type))
        except (FileNotFoundError, AssertionError, IndexError) as e:
            # Missing/broken validation data shouldn't kill a long training
            # run, but it must be loud: log the exception, don't just emit NaN.
            msg = f"validation on '{val_dataset}' failed: {type(e).__name__}: {e}"
            if logger is not None:
                logger.info(msg)
            else:
                print(msg)
            results[f"{val_dataset}-error"] = float("nan")
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--yaml", required=True, help="experiment config")
    parser.add_argument("--gpus", default=None, nargs="*",
                        help="accepted for reference-CLI compatibility; unused")
    parser.add_argument("--data-root", nargs="*", default=None,
                        help="override data roots, e.g. chairs=/data/FlyingChairs_release")
    parser.add_argument("--log-dir", default="runs")
    parser.add_argument("--compute-dtype", default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--corr-impl", default="auto",
                        choices=["auto", "xla", "mxu", "fused", "pallas"])
    parser.add_argument("--val-freq", type=int, default=5000)
    parser.add_argument("--device-aug", action="store_true",
                        help="run the augmentation recipes inside the jit'd "
                             "step (raw-frame loader; all training stages — "
                             "mixed stages dispatch dense/sparse per sample)")
    parser.add_argument("--profile-dir", default=None,
                        help="capture a jax.profiler trace into this dir")
    parser.add_argument("--profile-start", type=int, default=10)
    parser.add_argument("--profile-steps", type=int, default=5)
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() before "
                             "touching devices (multi-host pods / multi-slice "
                             "DCN; coordinator autodetected on TPU, or set "
                             "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
                             "JAX_PROCESS_ID). Single-host runs don't need it.")
    args = parser.parse_args()
    if args.multihost:
        # The SPMD replacement for the reference's torch.distributed env://
        # rendezvous (`ff-raft/train.py:128-132`): one call wires the
        # coordination service; the mesh + loader already shard by
        # jax.process_index(), so nothing else changes per process.
        jax.distributed.initialize()
    raise SystemExit(train(args))


if __name__ == "__main__":
    main()
