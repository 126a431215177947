"""Init-scale gate for the PWC family (round-3 trainability bug).

The reference PWC family has NO weight-init loop — torch Conv2d defaults
(kaiming_uniform(a=sqrt(5)), i.e. U(+-1/sqrt(fan_in))) apply everywhere
(`/root/reference/core/models/ff-pwcnet/PWCNet_Core/pwcnet.py` — contrast
the RAFT extractor's explicit kaiming loop, `extractor.py:150-157`).
Sharing the RAFT-family kaiming fan-out init amplified each DenseNet flow
head's init output ~20x and the coarse-to-fine feedback compounded it to
~1e8 px at init; AdamW then trained the net into an input-insensitive
predict-the-mean collapse (constant output regardless of input). Forward
parity tests could never catch this: they import torch weights, so the
flax initializers are never exercised.
"""

import numpy as np

import jax
import jax.numpy as jnp

from focusflow_official_tpu.models import FFPWCNet, FFRaftConfig, PWCNet


def _inputs(rng, h=128, w=192):
    return [jnp.asarray((rng.rand(1, h, w, c) * 255).astype(np.float32))
            for c in (3, 3, 1, 1)]


def test_ff_pwcnet_init_flow_magnitude():
    args = _inputs(np.random.RandomState(0))
    model = FFPWCNet(FFRaftConfig(fusion="parallel", fusion_type="1x1conv"))
    v = model.init(jax.random.PRNGKey(0), *args)
    flow = np.asarray(model.apply(v, *args, test_mode=True))
    # torch-default init measures ~0.35 px mean here; the kaiming fan-out
    # bug measured ~8.6e7. Anything image-scale at init is a regression.
    assert float(np.abs(flow).mean()) < 20.0, float(np.abs(flow).mean())
    assert np.isfinite(flow).all()


def test_vanilla_pwcnet_init_flow_magnitude():
    args = _inputs(np.random.RandomState(1))[:2]
    model = PWCNet()
    v = model.init(jax.random.PRNGKey(0), *args)
    flow = np.asarray(model.apply(v, *args, test_mode=True))
    assert float(np.abs(flow).mean()) < 20.0, float(np.abs(flow).mean())
    assert np.isfinite(flow).all()
