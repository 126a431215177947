#!/usr/bin/env python
"""Export an orbax checkpoint dir to the flat fp16 .npz fixture format.

Usage: export_fixture.py <orbax_export_dir> <out.npz> [--yaml cfg.yaml]

The fixture format is what `tests/test_trained_gates.py` loads: keys are
'/'-joined variable paths including the collection ('params/...',
'batch_stats/...'), values fp16 (half the size; the gates cast to f32).
The template model (default: configs/smoke_chairs.yaml) provides the tree
structure for the restore.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("export_dir")
    ap.add_argument("out")
    ap.add_argument("--yaml", default="configs/smoke_chairs.yaml")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp
    from flax import traverse_util

    from focusflow_official_tpu.cli.train import build_model_and_loss
    from focusflow_official_tpu.config import load_yaml_config

    cfg = load_yaml_config(args.yaml)
    shim = argparse.Namespace(compute_dtype="float32", corr_impl="xla")
    _, _, model, _, _ = build_model_and_loss(cfg, shim)
    zeros = lambda c: jnp.zeros((1, 64, 64, c), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), zeros(3), zeros(3),
                          zeros(1), zeros(1), iters=1)

    # norm-free models (PWC) have no batch_stats; the trainer's export has
    # no such key either, and orbax rejects an empty-dict mismatch
    item = {"params": template["params"]}
    if template.get("batch_stats", {}):
        item["batch_stats"] = template["batch_stats"]
    # Two on-disk formats: the trainer's final params-only export and the
    # periodic CheckpointManager step dirs, which also hold opt_state (see
    # train/checkpoints.py). Restore raw (no template) and keep only the
    # variable collections so either works.
    raw = ocp.StandardCheckpointer().restore(os.path.abspath(args.export_dir))
    variables = {k: raw[k] for k in item if k in raw}
    missing = [k for k in item if k not in variables]
    if missing:
        raise SystemExit(f"checkpoint lacks collections {missing}; "
                         f"has {sorted(raw)}")
    for k in item:
        want = set(traverse_util.flatten_dict(item[k]))
        got = set(traverse_util.flatten_dict(variables[k]))
        if want != got:
            raise SystemExit(
                f"{k} tree mismatch vs template: only-in-ckpt "
                f"{sorted(got - want)[:5]} only-in-template "
                f"{sorted(want - got)[:5]}")
    flat = traverse_util.flatten_dict(dict(variables))
    np.savez_compressed(
        args.out,
        **{"/".join(k): np.asarray(v, np.float16) for k, v in flat.items()})
    print(f"wrote {args.out}: {len(flat)} arrays")


if __name__ == "__main__":
    main()
