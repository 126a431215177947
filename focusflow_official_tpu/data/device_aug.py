"""On-device (jit) dense-flow augmentation — the input pipeline's hot half.

Distribution-equivalent port of the dense CPU recipe
(`data/augment.py::FlowAugmentor`, itself the behavioral equivalent of
`/root/reference/core/utils/augmentor.py:15-138`) into XLA, so the lone
host core only decodes+stacks raw frames (~6 ms/sample) while the TPU does
photometric jitter, eraser occlusion, and the scale/stretch/flip/crop warp
fused into the training step (measured: the threaded CPU augmentor caps at
~15 samples/s on this host — BENCH.md round 3 — vs ~13 needed per chip).

Design notes (TPU-first):
- The cv2 `resize(scale) -> flip -> crop` chain has dynamic intermediate
  shapes; here it is ONE static-shape separable bilinear warp: per-sample
  tent-weight matrices (crop_h, H_src) / (crop_w, W_src) built from iota
  with cv2's exact pixel mapping src = (dst + 0.5)/scale - 0.5 and edge
  clamping, applied as two batched MXU matmuls. Scale / crop offset / flip
  are all DATA (per-sample scalars), not shapes, so one compile serves
  every draw.
- Photometric ops are float equivalents of the PIL/torchvision uint8
  enhancers (brightness/contrast/saturation blends + HSV hue rotation),
  applied in a random order via `lax.switch`, symmetric or asymmetric
  across the two frames. Bit-exactness with PIL's uint8 LUT path is
  impossible in float; equivalence is distributional (tested to +-1/255
  per op against PIL in `tests/test_device_aug.py`).
- Heterogeneous source resolutions (mixed-dataset stages) ride a single
  compile: raw frames arrive zero-padded to the batch max (H, W) with true
  `sizes` passed per sample; means, scale floors, and sampling weights
  mask to the true extent.
- Mixed stages (sintel/kitti) mix datasets with DIFFERENT recipes (dense
  vs sparse, different scale ranges): recipes are rows of a scalar table
  and each sample carries a `recipe` index — per-sample dispatch is a
  table lookup plus selects, one compile for any mix. The sparse recipe's
  flow scatter (`augmentor.py::resize_sparse_flow_map`) is separable, so
  it becomes two static-shape 0/1 matmuls (`sparse_scatter_crop`) — no
  TPU scatter op; colliding points average instead of the reference's
  raster-order last write (distributional equivalence, downscale only).

The CPU augmentor remains the reference-exact default; this module is the
opt-in production path (`--device-aug`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# photometric: float equivalents of the torchvision/PIL jitter recipe
# ---------------------------------------------------------------------------


def _rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """PIL 'L' luma weights (ITU-R 601-2), no uint8 rounding."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def adjust_brightness(img, factor, mean_=None):
    return jnp.clip(img * factor, 0.0, 255.0)


def adjust_contrast(img, factor, mean_):
    """PIL Contrast: blend with the mean of the grayscale image. The mean is
    precomputed over the TRUE extent (padding excluded) and passed in."""
    return jnp.clip(mean_ * (1.0 - factor) + img * factor, 0.0, 255.0)


def adjust_saturation(img, factor, mean_=None):
    gray = _rgb_to_gray(img)[..., None]
    return jnp.clip(gray * (1.0 - factor) + img * factor, 0.0, 255.0)


def adjust_hue(img, shift, mean_=None):
    """Hue rotation by `shift` (fraction of the circle) via float HSV."""
    x = img / 255.0
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    c = mx - mn
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe_c,
        jnp.where(mx == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c))
    h = jnp.where(c > 0, h / 6.0, 0.0) % 1.0
    h = (h + shift) % 1.0
    # HSV -> RGB (v = mx, chroma preserved)
    hp = h * 6.0
    i = jnp.floor(hp)
    f = hp - i
    p = mx - c
    q = mx - c * f
    t = mx - c * (1.0 - f)
    i = i.astype(jnp.int32) % 6

    def pick(options):
        # select chain, NOT jnp.choose: choose lowers to a per-element
        # gather, which serializes on TPU
        out = options[0]
        for k in range(1, 6):
            out = jnp.where(i == k, options[k], out)
        return out

    r2 = pick([mx, q, p, p, t, mx])
    g2 = pick([t, mx, mx, q, p, p])
    b2 = pick([p, p, t, mx, mx, q])
    return jnp.clip(jnp.stack([r2, g2, b2], axis=-1) * 255.0, 0.0, 255.0)


def _color_jitter(rng, img, extent_mask, brightness, contrast, saturation, hue):
    """Random-order jitter of one (H, W, 3) float image in [0, 255].

    extent_mask: (H, W, 1) 1.0 inside the true image — means exclude
    padding. The op order is a uniform random permutation (matching
    torchvision's shuffle, `augment.py:68`)."""
    kb, kc, ks, kh, kperm = jax.random.split(rng, 5)
    # jnp.maximum, not max: strengths may be traced (per-sample recipes)
    fb = jax.random.uniform(kb, (), minval=jnp.maximum(0.0, 1 - brightness),
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=jnp.maximum(0.0, 1 - contrast),
                            maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=jnp.maximum(0.0, 1 - saturation),
                            maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)

    n_px = jnp.maximum(jnp.sum(extent_mask), 1.0)

    def apply_op(idx, im):
        # contrast needs the CURRENT image's gray mean over the true extent
        mean_ = jnp.sum(_rgb_to_gray(im)[..., None] * extent_mask) / n_px
        return jax.lax.switch(
            idx,
            [lambda m: adjust_brightness(m, fb),
             lambda m: adjust_contrast(m, fc, mean_),
             lambda m: adjust_saturation(m, fs),
             lambda m: adjust_hue(m, fh)],
            im)

    order = jax.random.permutation(kperm, 4)

    def body(i, im):
        return apply_op(order[i], im)

    return jax.lax.fori_loop(0, 4, body, img)


# ---------------------------------------------------------------------------
# eraser occlusion
# ---------------------------------------------------------------------------


def _eraser(rng, img2, extent_mask, size_hw, prob=0.5, bounds=(50, 100)):
    """Rectangles on img2 filled with its mean color (`augment.py:103-114`)."""
    k_gate, k_n, k_rect = jax.random.split(rng, 3)
    gate = jax.random.uniform(k_gate, ()) < prob
    n_rect = jax.random.randint(k_n, (), 1, 3)  # 1 or 2

    n_px = jnp.maximum(jnp.sum(extent_mask), 1.0)
    mean_color = jnp.sum(img2 * extent_mask, axis=(0, 1)) / n_px  # (3,)

    h, w = img2.shape[:2]
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    out = img2
    keys = jax.random.split(k_rect, 2)
    for r in range(2):
        k0, k1, k2, k3 = jax.random.split(keys[r], 4)
        x0 = jax.random.randint(k0, (), 0, jnp.maximum(size_hw[1], 1))
        y0 = jax.random.randint(k1, (), 0, jnp.maximum(size_hw[0], 1))
        dx = jax.random.randint(k2, (), bounds[0], bounds[1])
        dy = jax.random.randint(k3, (), bounds[0], bounds[1])
        inside = ((yy >= y0) & (yy < y0 + dy) & (xx >= x0) & (xx < x0 + dx))
        use = gate & (r < n_rect)
        out = jnp.where((inside & use)[..., None], mean_color, out)
    return out


# ---------------------------------------------------------------------------
# per-sample augmentation recipes (mixed-dataset stages)
# ---------------------------------------------------------------------------
#
# The sintel/kitti training stages mix datasets whose CPU augmentors differ
# (dense vs sparse recipe, different scale ranges — `data/datasets.py`
# fetch_dataset). On device this becomes DATA: each recipe is a row of
# scalars, each sample carries a `recipe` index, and the vmapped per-sample
# body indexes the table — one compile serves every mix.


def dense_recipe(min_scale: float, max_scale: float,
                 do_flip: bool = True) -> Dict[str, float]:
    """`FlowAugmentor` parameterization (`augment.py:15-138`)."""
    return dict(
        sparse=0.0, min_scale=min_scale, max_scale=max_scale,
        crop_margin=8.0, stretch_prob=0.8, spatial_aug_prob=0.8,
        h_flip_prob=0.5 if do_flip else 0.0,
        v_flip_prob=0.1 if do_flip else 0.0,
        asym_prob=0.2, brightness=0.4, contrast=0.4, saturation=0.4,
        hue=0.5 / 3.14)


def sparse_recipe(min_scale: float, max_scale: float,
                  do_flip: bool = True) -> Dict[str, float]:
    """`SparseFlowAugmentor` parameterization (`augmentor.py:140-279`):
    symmetric-only jitter(0.3), uniform scale (no stretch), h-flip only,
    crop margin +1 (vs the dense +8), sparse flow scatter."""
    return dict(
        sparse=1.0, min_scale=min_scale, max_scale=max_scale,
        crop_margin=1.0, stretch_prob=0.0, spatial_aug_prob=0.8,
        h_flip_prob=0.5 if do_flip else 0.0, v_flip_prob=0.0,
        asym_prob=0.0, brightness=0.3, contrast=0.3, saturation=0.3,
        hue=0.3 / 3.14)


# ---------------------------------------------------------------------------
# spatial: one separable bilinear warp == cv2.resize -> flip -> crop
# ---------------------------------------------------------------------------


def _axis_weights(out_len, src_len_static, src_len, offset, flip,
                  resized_len):
    """(out_len, src_len_static) tent weights for one axis of the warp.

    out index o samples resized-index r = offset + o (flipped:
    resized_len-1 - (offset+o)), i.e. source position
    (r + 0.5) * src/resized - 0.5 with cv2 edge clamping — cv2's effective
    scale is the RATIO OF ROUNDED SIZES, not the requested fx/fy
    (resize.cpp: inv_scale = dsize/ssize). Columns >= src_len (padding of a
    smaller-than-max sample) get zero weight."""
    o = jnp.arange(out_len, dtype=jnp.float32)
    r = jnp.where(flip, resized_len.astype(jnp.float32) - 1.0 - (offset + o),
                  offset + o)
    pos = (r + 0.5) * (src_len.astype(jnp.float32)
                       / resized_len.astype(jnp.float32)) - 0.5
    pos = jnp.clip(pos, 0.0, src_len.astype(jnp.float32) - 1.0)
    grid = jnp.arange(src_len_static, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - grid[None, :]))
    return w * (grid[None, :] < src_len).astype(jnp.float32)


def warp_resize_crop(img, sy, sx, y0, x0, fv, fh, size_hw, resized_hw,
                     crop_size):
    """Separable bilinear warp of (H, W, C): cv2.resize(sx, sy, INTER_LINEAR)
    -> [flip] -> crop(crop_size at (y0, x0)), with dynamic scalars and static
    shapes. Two MXU matmuls; exact bilinear with edge clamp. sy/sx are kept
    for the caller's flow scaling; the geometric scale is resized_hw/size_hw
    (cv2 semantics)."""
    h, w = img.shape[:2]
    ch, cw = crop_size
    wy = _axis_weights(ch, h, size_hw[0], y0, fv, resized_hw[0])
    wx = _axis_weights(cw, w, size_hw[1], x0, fh, resized_hw[1])
    tmp = jnp.einsum("oh,hwc->owc", wy, img,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("pw,owc->opc", wx, tmp,
                      precision=jax.lax.Precision.HIGHEST)


def _scatter_axis_matrix(out_len, src_len_static, src_len, offset, flip,
                         resized_len, scale, strict):
    """(out_len, src_len_static) 0/1 matrix for one axis of the sparse
    scatter: M[o, s] = 1 iff source index s lands on crop-window row o.

    The reference scatter (`augment.py::resize_sparse_flow_map`) sends
    source s to resized index round(s * scale) — np.round is
    half-to-even, as is jnp.round. `strict` reproduces its boundary quirk
    (xx > 0, i.e. resized index 0 is DROPPED); the no-resize path never
    scatters in the reference, so strict=False there. The map is separable,
    so scatter+flip+crop become two static-shape matmuls — same structure
    as the dense warp, no TPU scatter op (which would serialize)."""
    o = jnp.arange(out_len, dtype=jnp.float32)
    r = jnp.where(flip, resized_len.astype(jnp.float32) - 1.0 - (offset + o),
                  offset + o)  # global resized-space index of window row o
    s = jnp.arange(src_len_static, dtype=jnp.float32)
    tgt = jnp.round(s * scale)
    m = (tgt[None, :] == r[:, None]) & (s[None, :] < src_len)
    lo_ok = jnp.where(strict, r > 0, r >= 0)
    m = m & (lo_ok & (r < resized_len.astype(jnp.float32)))[:, None]
    return m.astype(jnp.float32)


def sparse_scatter_crop(flow, valid, sy, sx, y0, x0, fh, size_hw, resized_hw,
                        crop_size, strict):
    """Sparse flow map resize -> [h-flip] -> crop, gather/scatter-free.

    flow (H, W, 2), valid (H, W). Where several sources collide on one
    target pixel the reference keeps the raster-order LAST write; here they
    average (a sum/count matmul pair) — a documented distributional
    equivalence, collisions only exist on downscale. Returns
    (flow (ch, cw, 2) scaled by (sx, sy) and sign-flipped, valid (ch, cw))."""
    h, w = flow.shape[:2]
    ch, cw = crop_size
    my = _scatter_axis_matrix(ch, h, size_hw[0], y0, jnp.asarray(False),
                              resized_hw[0], sy, strict)
    mx = _scatter_axis_matrix(cw, w, size_hw[1], x0, fh, resized_hw[1], sx,
                              strict)
    v = valid.astype(jnp.float32)[..., None]
    num = jnp.einsum("oh,hwc->owc", my, flow * v,
                     precision=jax.lax.Precision.HIGHEST)
    num = jnp.einsum("pw,owc->opc", mx, num,
                     precision=jax.lax.Precision.HIGHEST)
    cnt = jnp.einsum("oh,hwc->owc", my, v,
                     precision=jax.lax.Precision.HIGHEST)
    cnt = jnp.einsum("pw,owc->opc", mx, cnt,
                     precision=jax.lax.Precision.HIGHEST)
    flow_out = num / jnp.maximum(cnt, 1.0)
    flow_out = flow_out * jnp.stack([sx, sy])
    flow_out = flow_out * jnp.stack([jnp.where(fh, -1.0, 1.0), 1.0])
    return flow_out, (cnt[..., 0] > 0).astype(jnp.float32)


class DeviceFlowAugmentor:
    """Recipe-table augmentor running under jit (see module docstring).

    Call with a raw batch dict (image1/image2/flow/mask1/mask2 as
    (B, H, W, C) float32, optional valid (B, H, W), optional sizes (B, 2)
    int32 true (h, w), optional recipe (B,) int32 index into `recipes`)
    and a PRNG key; returns the same keys cropped to `crop_size`.

    With the default single dense recipe this is the chairs/things path;
    mixed stages (sintel/kitti) pass one recipe per source dataset
    (`dense_recipe`/`sparse_recipe`) and per-sample `recipe` indices.
    """

    def __init__(self, crop_size: Tuple[int, int], min_scale: float = -0.2,
                 max_scale: float = 0.5, do_flip: bool = True, recipes=None):
        self.crop_size = tuple(crop_size)
        if recipes is None:
            recipes = [dense_recipe(min_scale, max_scale, do_flip)]
        self.table = {k: jnp.asarray([r[k] for r in recipes], jnp.float32)
                      for k in recipes[0]}
        self.max_stretch = 0.2
        self.eraser_aug_prob = 0.5

    def _one(self, rng, img1, img2, flow, valid, mask1, mask2, size_hw, rid):
        ch, cw = self.crop_size
        h, w = img1.shape[:2]
        rp = {k: v[rid] for k, v in self.table.items()}
        ks = jax.random.split(rng, 13)
        extent = ((jnp.arange(h)[:, None] < size_hw[0])
                  & (jnp.arange(w)[None, :] < size_hw[1]))[..., None]
        extent = extent.astype(jnp.float32)

        # -- photometric (asymmetric with recipe prob, else ONE param draw
        # over the vertically stacked pair — exactly the reference's
        # np.concatenate trick, so e.g. the contrast mean spans both frames)
        asym = jax.random.uniform(ks[0], ()) < rp["asym_prob"]
        jit_args = (rp["brightness"], rp["contrast"], rp["saturation"],
                    rp["hue"])
        stack = jnp.concatenate([img1, img2], axis=0)
        ext2 = jnp.concatenate([extent, extent], axis=0)
        sym = _color_jitter(ks[1], stack, ext2, *jit_args)
        sym1, sym2 = jnp.split(sym, 2, axis=0)
        a1 = _color_jitter(ks[2], img1, extent, *jit_args)
        a2 = _color_jitter(ks[3], img2, extent, *jit_args)
        img1 = jnp.where(asym, a1, sym1)
        img2 = jnp.where(asym, a2, sym2)

        # -- eraser on frame 2
        img2 = _eraser(ks[4], img2, extent, size_hw, self.eraser_aug_prob)

        # -- spatial params (`augment.py:117-153`; sparse `augmentor.py:228-256`)
        hf = size_hw[0].astype(jnp.float32)
        wf = size_hw[1].astype(jnp.float32)
        m = rp["crop_margin"]  # dense +8, sparse +1
        min_scale = jnp.maximum((ch + m) / hf, (cw + m) / wf)
        scale = 2.0 ** jax.random.uniform(ks[5], (), minval=rp["min_scale"],
                                          maxval=rp["max_scale"])
        do_stretch = jax.random.uniform(ks[6], ()) < rp["stretch_prob"]
        st = 2.0 ** jax.random.uniform(ks[7], (2,), minval=-self.max_stretch,
                                       maxval=self.max_stretch)
        sx = scale * jnp.where(do_stretch, st[0], 1.0)
        sy = scale * jnp.where(do_stretch, st[1], 1.0)
        sx = jnp.maximum(sx, min_scale)
        sy = jnp.maximum(sy, min_scale)
        do_spatial = jax.random.uniform(ks[8], ()) < rp["spatial_aug_prob"]
        sx = jnp.where(do_spatial, sx, 1.0)
        sy = jnp.where(do_spatial, sy, 1.0)
        hs = jnp.round(hf * sy).astype(jnp.int32)
        ws = jnp.round(wf * sx).astype(jnp.int32)
        resized_hw = (hs, ws)

        fh = jax.random.uniform(ks[9], ()) < rp["h_flip_prob"]
        fv = jax.random.uniform(ks[10], ()) < rp["v_flip_prob"]

        y0 = jax.random.randint(ks[11], (), 0, jnp.maximum(hs - ch, 1))
        x0 = jax.random.randint(ks[12], (), 0, jnp.maximum(ws - cw, 1))

        warp = lambda a: warp_resize_crop(a, sy, sx, y0, x0, fv, fh,
                                          size_hw, resized_hw, self.crop_size)
        img1, img2, mask1, mask2 = warp(img1), warp(img2), warp(mask1), warp(mask2)

        # dense flow: bilinear-warped like the images, valid recomputed
        flow_d = warp(flow) * jnp.stack([sx, sy])
        flow_d = flow_d * jnp.stack([jnp.where(fh, -1.0, 1.0),
                                     jnp.where(fv, -1.0, 1.0)])
        valid_d = ((jnp.abs(flow_d[..., 0]) < 1000)
                   & (jnp.abs(flow_d[..., 1]) < 1000)).astype(jnp.float32)
        # sparse flow: point scatter (strict-bounds quirk only when the
        # reference actually resizes); vmap turns this cond into a select,
        # so both paths run — the scatter is two extra small matmuls
        flow_s, valid_s = sparse_scatter_crop(
            flow, valid, sy, sx, y0, x0, fh, size_hw, resized_hw,
            self.crop_size, strict=do_spatial)
        is_sparse = rp["sparse"] > 0.5
        flow = jnp.where(is_sparse, flow_s, flow_d)
        valid = jnp.where(is_sparse, valid_s, valid_d)
        return img1, img2, flow, valid, mask1, mask2

    def __call__(self, rng, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        b, h, w = batch["image1"].shape[:3]
        sizes = batch.get("sizes")
        if sizes is None:
            sizes = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (b, 1))
        recipe = batch.get("recipe")
        if recipe is None:
            recipe = jnp.zeros((b,), jnp.int32)
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones((b, h, w), jnp.float32)
        rngs = jax.random.split(rng, b)
        img1, img2, flow, valid, mask1, mask2 = jax.vmap(self._one)(
            rngs, batch["image1"], batch["image2"], batch["flow"], valid,
            batch["mask1"], batch["mask2"], sizes, recipe)
        out = dict(batch)
        out.update(image1=img1, image2=img2, flow=flow, valid=valid,
                   mask1=mask1, mask2=mask2)
        out.pop("sizes", None)
        out.pop("recipe", None)
        return out
