"""Spatial (model-axis) sharding of the correlation volume (SURVEY.md §5.7).

FocusFlow's "long context" axis is H*W: the all-pairs volume is O((HW)^2)
and walls out single-device memory at large frames. These tests exercise
the `model` mesh axis for real on 8 virtual devices: the sharded lookup is
bit-exact, and the full forward executes end-to-end with the volume
sharded (GSPMD inserts the halo exchanges). The full-forward comparison is
necessarily loose: with untrained weights the refinement iterations are
chaotic — even unsharded jit-vs-eager differs by ~0.2 px here, so only
op-level checks can be tight.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from focusflow_official_tpu.models import FFRaft, FFRaftConfig
from focusflow_official_tpu.ops.corr import all_pairs_corr, lookup_corr_fused
from focusflow_official_tpu.train.mesh import (
    make_mesh,
    replicate,
    shard_queries,
    spatial_sharding,
)

RNG = np.random.RandomState(31)


def _mesh():
    assert jax.device_count() >= 8
    return make_mesh(jax.devices()[:8], model_axis=8)  # data=1, model=8


def test_shard_queries_noop_outside_context():
    x = jnp.ones((1, 16, 4, 4))
    assert shard_queries(x) is x


def test_sharded_fused_lookup_exact():
    """Query-sharded volume + fused lookup == unsharded, to f32 rounding."""
    h1, w1, c = 8, 12, 32
    f1 = jnp.asarray(RNG.randn(1, h1, w1, c).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(1, h1, w1, c).astype(np.float32))
    gy, gx = np.meshgrid(np.arange(h1), np.arange(w1), indexing="ij")
    coords = jnp.asarray((np.stack([gx, gy], -1)[None]
                          + RNG.randn(1, h1, w1, 2) * 3).astype(np.float32))

    want = np.asarray(lookup_corr_fused(all_pairs_corr(f1, f2), coords, 4, 4,
                                        dtype=jnp.float32))

    mesh = _mesh()
    with spatial_sharding(mesh):
        @jax.jit
        def run(f1, f2, coords):
            corr0 = shard_queries(all_pairs_corr(f1, f2), axis=1)
            return lookup_corr_fused(corr0, coords, 4, 4, dtype=jnp.float32)

        got = np.asarray(run(*[jax.device_put(a, replicate(mesh))
                               for a in (f1, f2, coords)]))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_spatially_sharded_forward_executes():
    """Full FF-RAFT forward with the O((HW)^2) volume sharded over 8
    devices: compiles, runs, finite, and in the same ballpark as the
    unsharded jit (loose bound — untrained iterations are chaotic)."""
    mesh = _mesh()
    cfg = FFRaftConfig(fusion="parallel", fuse_cnet=True, iters=2,
                       compute_dtype="float32", corr_impl="fused")
    model = FFRaft(cfg)
    args = (
        jnp.asarray((RNG.rand(1, 64, 96, 3) * 255).astype(np.float32)),
        jnp.asarray((RNG.rand(1, 64, 96, 3) * 255).astype(np.float32)),
        jnp.asarray(((RNG.rand(1, 64, 96, 1) > 0.95) * 255).astype(np.float32)),
        jnp.asarray(((RNG.rand(1, 64, 96, 1) > 0.95) * 255).astype(np.float32)),
    )
    variables = model.init(jax.random.PRNGKey(0), *args, iters=1)

    @jax.jit
    def fwd(v, a, b, c, d):
        _, up = model.apply(v, a, b, c, d, iters=2, test_mode=True)
        return up

    want = np.asarray(fwd(variables, *args))

    variables_r = jax.device_put(variables, replicate(mesh))
    args_r = [jax.device_put(a, replicate(mesh)) for a in args]
    with spatial_sharding(mesh):
        @jax.jit
        def fwd_sharded(v, a, b, c, d):
            _, up = model.apply(v, a, b, c, d, iters=2, test_mode=True)
            return up

        got = np.asarray(fwd_sharded(variables_r, *args_r))

    assert got.shape == want.shape
    assert np.isfinite(got).all()
    # chaos-bounded agreement: same order of magnitude, correlated fields
    denom = np.abs(want).mean() + 1e-6
    assert np.abs(got - want).mean() / denom < 1.0, (
        np.abs(got - want).mean(), denom)


@pytest.mark.slow
def test_hybrid_dp_sp_forward_trained():
    """2-D mesh (data=4, model=2): batch sharded over `data` AND the corr
    volume query-sharded over `model`, in ONE program — the dp x sp hybrid
    GSPMD composition no 1-D test exercises. Trained fixture weights make
    the comparison tight (untrained iterations amplify float noise
    chaotically; see the module docstring)."""
    from test_trained_gates import _cfg as trained_cfg
    from test_trained_gates import load_trained_variables

    try:
        variables = load_trained_variables()
    except FileNotFoundError:  # pragma: no cover
        pytest.skip("trained fixture not built")

    from focusflow_official_tpu.train.mesh import shard_batch

    mesh = make_mesh(jax.devices()[:8], model_axis=2)  # data=4, model=2
    cfg = trained_cfg(corr_impl="fused", compute_dtype="float32")
    model = FFRaft(cfg)

    rng = np.random.RandomState(7)
    args = (
        jnp.asarray((rng.rand(4, 96, 128, 3) * 255).astype(np.float32)),
        jnp.asarray((rng.rand(4, 96, 128, 3) * 255).astype(np.float32)),
        jnp.asarray(((rng.rand(4, 96, 128, 1) > 0.97) * 255).astype(np.float32)),
        jnp.asarray(((rng.rand(4, 96, 128, 1) > 0.97) * 255).astype(np.float32)),
    )

    @jax.jit
    def fwd(v, a, b, c, d):
        _, up = model.apply(v, a, b, c, d, iters=6, test_mode=True)
        return up

    want = np.asarray(fwd(variables, *args))

    variables_r = jax.device_put(variables, replicate(mesh))
    args_r = [jax.device_put(a, shard_batch(mesh)) for a in args]
    with spatial_sharding(mesh):
        @jax.jit
        def fwd_hybrid(v, a, b, c, d):
            _, up = model.apply(v, a, b, c, d, iters=6, test_mode=True)
            return up

        got = np.asarray(fwd_hybrid(variables_r, *args_r))

    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-4)
