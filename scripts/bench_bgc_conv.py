"""Microbenchmark: batch_group_count=2 conv as a two-branch fuser.

The CCE's image and mask branches run identical-shape 64-channel 3x3 convs
with different weights (`nn/cce.py`); N=64 half-fills the MXU's 128 lanes
(BENCH.md Finding 4: dense 128ch has 2.2x the FLOP efficiency of 64ch).
`feature_group_count=2` was measured catastrophic (2.08 ms vs 2x0.61).
This measures the OTHER grouping: `batch_group_count=2` — stack the two
branches along batch, concat their kernels along output features, and get
one conv whose output packs both branches on the 128-lane axis:

    lhs (2B, H, W, 64), rhs (3, 3, 64, 128), bgc=2 -> out (B, H, W, 128)
    out[..., :64] == conv(x, Wx); out[..., 64:] == conv(m, Wm)

Also times the repack steps a real integration needs: (B,...,128) ->
(2B,...,64) between convs, and the packed variant where norms/ReLU stay
on 128ch and only correctness-splits at the fusion unit.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(f, *args, iters=30):
    r = f(*args)
    jax.tree.map(lambda a: np.asarray(a[..., :1, :1]), r)  # force host fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.tree.map(lambda a: np.asarray(a[..., :1, :1]), r)
    return (time.perf_counter() - t0) / iters * 1e3


DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def conv(x, w, bgc=1):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN,
        batch_group_count=bgc, precision=lax.Precision.HIGHEST)


def main():
    key = jax.random.PRNGKey(0)
    B, H, W, C = 10, 56, 512, 64
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    m = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    wx = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16)
    wm = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16)

    xm = jnp.concatenate([x, m], 0)            # (2B, H, W, 64)
    wxm = jnp.concatenate([wx, wm], -1)        # (3, 3, 64, 128)

    two = jax.jit(lambda a, b, u, v: (conv(a, u), conv(b, v)))
    bgc = jax.jit(lambda ab, uv: conv(ab, uv, bgc=2))

    # numerical check
    o2 = two(x, m, wx, wm)
    ob = bgc(xm, wxm)
    err = max(float(jnp.abs(ob[..., :64] - o2[0]).max()),
              float(jnp.abs(ob[..., 64:] - o2[1]).max()))
    print(f"bgc vs separate max abs err: {err:.2e}")

    t_two = timeit(two, x, m, wx, wm)
    t_bgc = timeit(bgc, xm, wxm)
    print(f"2x separate 64ch convs : {t_two:.3f} ms")
    print(f"1x bgc=2 conv -> 128ch : {t_bgc:.3f} ms")

    # chain of 4 convs with the repack between (what layer1 integration pays):
    # (B,...,128) -> split lanes -> (2B,...,64)
    def repack(o):  # (B, H, W, 128) -> (2B, H, W, 64)
        return jnp.concatenate([o[..., :64], o[..., 64:]], 0)

    def chain_bgc(ab, uv):
        for _ in range(4):
            o = conv(ab, uv, bgc=2)
            o = jax.nn.relu(o)
            ab = repack(o)
        return ab

    def chain_two(a, b, u, v):
        for _ in range(4):
            a = jax.nn.relu(conv(a, u))
            b = jax.nn.relu(conv(b, v))
        return a, b

    t_cb = timeit(jax.jit(chain_bgc), xm, wxm)
    t_ct = timeit(jax.jit(chain_two), x, m, wx, wm)
    print(f"4-conv chain, separate : {t_ct:.3f} ms")
    print(f"4-conv chain, bgc+repack: {t_cb:.3f} ms")

    # dense 128 reference point for the lane-fill ceiling
    y = jax.random.normal(key, (B, H, W, 128), jnp.bfloat16)
    wd = jax.random.normal(key, (3, 3, 128, 128), jnp.bfloat16)
    t_d = timeit(jax.jit(lambda a, u: conv(a, u)), y, wd)
    print(f"dense 128->128 conv    : {t_d:.3f} ms (2x the FLOPs of the pair)")

    # BLOCK-DIAGONAL packing: both branches live on the 128-lane axis for the
    # whole chain; kernels are (3,3,128,128) with zero off-diagonal blocks
    # (hoisted, built at trace time from the two 64ch params). No repacking
    # between convs — the off-diagonal zeros are wasted FLOPs, the lane fill
    # is doubled; which effect wins is what this measures. 8-conv chains to
    # amortize the ~2-3 ms tunnel dispatch floor.
    z64 = jnp.zeros((3, 3, C, C), jnp.bfloat16)
    wbd = jnp.concatenate([
        jnp.concatenate([wx, z64], -1),
        jnp.concatenate([z64, wm], -1)], -2)     # (3,3,128,128) blockdiag
    xm_p = jnp.concatenate([x, m], -1)           # (B, H, W, 128) packed

    def chain_bd(a, u, n=8):
        for _ in range(n):
            a = jax.nn.relu(conv(a, u))
        return a

    def chain_two8(a, b, u, v, n=8):
        for _ in range(n):
            a = jax.nn.relu(conv(a, u))
            b = jax.nn.relu(conv(b, v))
        return a, b

    # numerical check of the packing
    ob = jax.jit(lambda a, u: conv(a, u))(xm_p, wbd)
    err = max(float(jnp.abs(ob[..., :64] - o2[0]).max()),
              float(jnp.abs(ob[..., 64:] - o2[1]).max()))
    print(f"blockdiag vs separate max abs err: {err:.2e}")

    t_bd8 = timeit(jax.jit(chain_bd), xm_p, wbd)
    t_tw8 = timeit(jax.jit(chain_two8), x, m, wx, wm)
    print(f"8-conv chain, separate  : {t_tw8:.3f} ms")
    print(f"8-conv chain, blockdiag : {t_bd8:.3f} ms")


if __name__ == "__main__":
    main()
