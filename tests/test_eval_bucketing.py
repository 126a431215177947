"""Shape-bucketed KITTI validation: one compile, extent-masked metrics.

Covers the round-3 eval-recompile fix (`train/evaluate.py`): KITTI frames
come in several native resolutions; bucketing pads every sample to one
canonical /8 shape and masks all metrics to the true extent, so a full
validation pass costs ONE XLA compile. Reference protocol:
`/root/reference/core/models/ff-raft/evaluate.py:89-134`.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from focusflow_official_tpu.models import FFRaft, FFRaftConfig
from focusflow_official_tpu.train.evaluate import (
    _collect, _make_metrics_fn, _pad_canonical, validate_kitti,
)


class _FakeKitti:
    """Two KITTI-ish samples with DIFFERENT native shapes + sparse GT."""

    def __init__(self, shapes=((160, 288), (152, 296))):
        rng = np.random.RandomState(7)
        self.samples = []
        for h, w in shapes:
            flow = rng.randn(h, w, 2).astype(np.float32) * 2
            valid = (rng.rand(h, w) > 0.4).astype(np.float32)
            mask = np.zeros((h, w, 1), np.float32)
            mask[::13, ::17] = 255.0
            self.samples.append({
                "image1": (rng.rand(h, w, 3) * 255).astype(np.float32),
                "image2": (rng.rand(h, w, 3) * 255).astype(np.float32),
                "mask1": mask,
                "mask2": np.full_like(mask, 255.0),
                "flow": flow,
                "valid": valid,
            })

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def _tiny_model():
    cfg = FFRaftConfig(fusion="parallel", fusion_type="1x1conv",
                       fuse_cnet=True, iters=2, corr_impl="xla")
    model = FFRaft(cfg)
    ds = _FakeKitti()
    s = ds[0]
    import jax

    variables = model.init(
        jax.random.PRNGKey(0),
        *[jnp.asarray(s[k][None]) for k in
          ("image1", "image2", "mask1", "mask2")], iters=1)
    return model, variables, ds


def test_pad_canonical_placement():
    x = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    # kitti mode: bottom pad, centered W
    p = _pad_canonical(x, (5, 8), "kitti", edge=False)
    assert p.shape == (5, 8, 1)
    assert np.all(p[:3, 2:6] == x)
    assert p[:, :2].sum() == 0 and p[:, 6:].sum() == 0 and p[3:].sum() == 0
    # sintel mode: centered both
    p = _pad_canonical(x, (5, 8), "sintel", edge=False)
    assert np.all(p[1:4, 2:6] == x)
    with pytest.raises(ValueError):
        _pad_canonical(x, (2, 8), "kitti", edge=False)


def test_one_compile_two_shapes():
    model, variables, ds = _tiny_model()
    traces = []
    fn = _make_metrics_fn(model, variables, iters=2, pad_mode="kitti",
                          sparse=True, bucketed=True)
    inner = fn

    def counting(*args):
        traces.append(tuple(np.asarray(a).shape for a in args))
        return inner(*args)

    m = _collect(ds, counting, None, canonical=(160, 296), pad_mode="kitti")
    assert m.shape == (2, 6)
    assert np.all(np.isfinite(m[:, [0, 1, 3, 4, 5]]))
    # every sample hit the SAME canonical shape -> one jit cache entry
    assert len(set(traces)) == 1


def test_bucketed_exact_when_native_is_canonical():
    """A sample already at the canonical /8 shape must produce EXACTLY the
    per-shape (unbucketed) metrics — masking machinery is then provably
    metric-neutral."""
    model, variables, ds = _tiny_model()
    sample_ds = type("D", (), {
        "__len__": lambda self: 1,
        "__getitem__": lambda self, i: ds[0],
    })()
    h, w = ds[0]["flow"].shape[:2]  # 160x288, already /8
    bucketed = _collect(
        sample_ds,
        _make_metrics_fn(model, variables, 2, "kitti", sparse=True,
                         bucketed=True),
        None, canonical=(h, w), pad_mode="kitti")
    native = _collect(
        sample_ds,
        _make_metrics_fn(model, variables, 2, "kitti", sparse=True,
                         bucketed=False),
        None)
    np.testing.assert_allclose(bucketed, native, rtol=1e-6)


def test_validate_kitti_bucketed_end_to_end():
    model, variables, ds = _tiny_model()
    res = validate_kitti(model, variables, ds, iters=2, canonical=(160, 296))
    assert set(res) == {"kitti-epe", "kitti-f1", "kitti-orb"}
    assert np.isfinite(res["kitti-epe"]) and 0 <= res["kitti-f1"] <= 100
    # keypoint metric exists (mask has keypoints in the true extent)
    assert np.isfinite(res["kitti-orb"])
