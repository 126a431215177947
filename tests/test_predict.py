"""FlowPredictor: the three-line inference API (predict.py).

Covers orbax round-trip loading, HWC/NHWC + uint8 handling, /8 padding on
non-multiple resolutions, default zero masks, and the pad_to bucket.
The reference has no predict entry point (inference lives inside
`ff-raft/evaluate.py:47-86`); this is the framework's user-facing wrapper
around the same forward path.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from focusflow_official_tpu.predict import FlowPredictor


@pytest.fixture(scope="module")
def smoke_checkpoint(tmp_path_factory):
    """Init the smoke-config model and save an orbax checkpoint."""
    import orbax.checkpoint as ocp

    from focusflow_official_tpu.cli.train import build_model_and_loss
    from focusflow_official_tpu.config import load_yaml_config

    import argparse

    cfg = load_yaml_config("configs/smoke_chairs.yaml")
    shim = argparse.Namespace(compute_dtype="float32", corr_impl="xla")
    _, _, model, _, _ = build_model_and_loss(cfg, shim)
    zeros = lambda c: jnp.zeros((1, 64, 64, c), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), zeros(3), zeros(3),
                           zeros(1), zeros(1), iters=1)
    path = os.path.join(tmp_path_factory.mktemp("ckpt"), "export")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": variables["params"],
                      "batch_stats": variables.get("batch_stats", {})})
    # StandardCheckpointer saves ASYNCHRONOUSLY (it is an AsyncCheckpointer):
    # without this barrier the restore below races the background commit
    # rename and flakes with FileNotFoundError under load.
    ckptr.wait_until_finished()
    return path


def test_predict_hwc_uint8_nonmultiple_shape(smoke_checkpoint):
    p = FlowPredictor("configs/smoke_chairs.yaml", smoke_checkpoint,
                      compute_dtype="float32", corr_impl="xla", iters=2)
    rng = np.random.RandomState(0)
    img1 = (rng.rand(67, 101, 3) * 255).astype(np.uint8)  # not /8
    img2 = (rng.rand(67, 101, 3) * 255).astype(np.uint8)
    flow = p(img1, img2)  # masks default to zeros
    assert flow.shape == (67, 101, 2) and flow.dtype == np.float32
    assert np.isfinite(flow).all()


def test_predict_batched_with_masks_and_bucket(smoke_checkpoint):
    p = FlowPredictor("configs/smoke_chairs.yaml", smoke_checkpoint,
                      compute_dtype="float32", corr_impl="xla", iters=2,
                      pad_to=(96, 128))
    rng = np.random.RandomState(1)
    i1 = (rng.rand(2, 80, 112, 3) * 255).astype(np.float32)
    i2 = (rng.rand(2, 80, 112, 3) * 255).astype(np.float32)
    m1 = ((rng.rand(2, 80, 112, 1) > 0.98) * 255).astype(np.float32)
    flow = p(i1, i2, m1, m1)
    assert flow.shape == (2, 80, 112, 2)
    assert np.isfinite(flow).all()
    # a second, smaller shape rides the same bucket (same compiled forward)
    flow2 = p(i1[:, :64, :96], i2[:, :64, :96])
    assert flow2.shape == (2, 64, 96, 2)


def test_sequence_warm_start(smoke_checkpoint):
    p = FlowPredictor("configs/smoke_chairs.yaml", smoke_checkpoint,
                      compute_dtype="float32", corr_impl="xla", iters=2)
    rng = np.random.RandomState(2)
    frames = (rng.rand(3, 64, 96, 3) * 255).astype(np.float32)
    flows = p.sequence(frames, warm_start=True)
    assert flows.shape == (2, 64, 96, 2)
    assert np.isfinite(flows).all()
    # warm start changes the second pair's init (untrained nets diverge)
    cold = p.sequence(frames, warm_start=False)
    assert not np.allclose(flows[1], cold[1])
    np.testing.assert_allclose(flows[0], cold[0], atol=1e-5)  # first pair same
