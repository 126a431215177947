"""FF-RAFT: keypoint-conditioned RAFT with the Condition Control Encoder.

TPU-native redesign of the reference model stack
(`/root/reference/core/models/ff-raft/FF_RAFT_Core/raft.py` and
`ff_raft.py:75-160`):

- NHWC layout throughout; bf16-capable compute with f32 parameters;
- the feature encoder runs ONCE over a batch-concat of both frames (the
  reference's list trick, `extractor.py:171-174`, which is exact for the
  instance-norm fnet) — bigger batches feed the MXU better;
- the all-pairs correlation volume is a single (B, HW, HW) MXU matmul; the
  4-level pyramid + windowed bilinear lookup live in `ops/corr.py`;
- the 12/32-step ConvGRU refinement is a `nn.scan` (`lax.scan`) — one traced
  step body, no Python-loop unrolling, per-iteration `stop_gradient` on the
  coordinates exactly like the reference's `coords1.detach()`;
- in test mode only the final flow is convex-upsampled; in train mode the
  scan emits every iteration's upsampled flow for the sequence loss.

The reference's opt-in `alternate_corr` CUDA path (`corr.py:63-91`) has a
full TPU-native analog here: `cfg.alt_corr=True` routes each iteration
through `ops.corr.alternate_corr_lookup` — chunked MXU recompute straight
from the feature maps, never materializing the O((HW)^2) volume (scales to
1440p where the materialized volume OOMs the compiler; BENCH.md). The
'attention'/'conv' fusion front-ends (`fusion.py`/`conv_fusion.py`) are
provided separately in `models/frontends.py`.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.cce import BasicParallelFusionLayer
from ..nn.encoders import BasicEncoder, ChannelProject, SmallEncoder
from ..nn.update import BasicUpdateBlock, SmallUpdateBlock
from ..ops.coords import coords_grid, upflow8
from ..ops.corr import (
    CorrPyramid, all_pairs_corr, corr_pyramid, lookup_corr_fused_chunks,
    lookup_corr_pyramid,
)
from ..ops.upsample import (convex_upsample, convex_upsample_flat,
                            depth_to_space_flow)
from .config import FFRaftConfig
from .mask_modal import init_mask


class RAFTStep(nn.Module):
    """One GRU refinement iteration — the body of the `lax.scan`."""

    small: bool
    corr_levels: int
    corr_radius: int
    hidden_dim: int
    emit_upsampled: bool
    corr_impl: str
    alt_corr: bool = False
    alt_corr_chunk: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, is_last, consts):
        net, coords1, _ = carry
        inp, coords0, levels = consts

        # Reference detaches coords each iteration (`raft.py:216`).
        coords1 = jax.lax.stop_gradient(coords1)
        if self.alt_corr:
            # ALT_CORR: on-the-fly chunked correlation from the fmaps —
            # `levels` carries (fmap1, fmap2), no volume was materialized
            from ..ops.corr import alternate_corr_lookup

            fmap1, fmap2 = levels
            corr = alternate_corr_lookup(
                fmap1, fmap2, coords1, self.corr_radius,
                num_levels=self.corr_levels, chunk=self.alt_corr_chunk,
                dtype=self.dtype)
        elif (self.corr_impl == "fused" and self.corr_levels > 1
              and len(levels) == 2 and levels[0].dtype == jnp.int8):
            # FF_CORR_Q8 eval path: `levels` carries (int8 volume, row scale).
            # '1' = int8 STORAGE, bf16 dot (measured winner — the full-int8
            # variant's per-iteration tent quantize/clip VPU passes made it
            # LOSE in-model, 24.5 vs 30.6 fps; BENCH.md round 4);
            # 'mxu8' = int8 x int8 -> s32 MXU dot (kept as the recorded A/B).
            import os as _os

            if _os.environ.get("FF_CORR_Q8") == "mxu8":
                from ..ops.corr import lookup_corr_fused_chunks_q8 as _q8

            else:
                from ..ops.corr import lookup_corr_fused_chunks_q8s as _q8

            corr = _q8(
                levels[0], levels[1], coords1, self.corr_radius,
                num_levels=self.corr_levels, dtype=self.dtype)
        elif self.corr_impl == "fused" and self.corr_levels > 1:
            pyramid = CorrPyramid(levels=levels, radius=self.corr_radius)
            # chunked fused lookup: per-level (B, Q, K, K) query-space
            # blocks; the motion encoder folds the reference channel order
            # AND the NHWC repack into its (loop-invariant) convc1 kernel.
            # (Measured-slower A/B variants, BENCH.md round 3: 'packed'
            # VPU stage 2 = 26.6 fps (Q-minor reduce layouts), 'full'
            # (LK,LK) product + block-sparse convc1 = 27.1 fps, vs 29.1
            # for chunks.)
            import os

            if os.environ.get("FF_FUSED_STAGE2", "chunks") == "full":
                from ..ops.corr import lookup_corr_fused_full

                corr = lookup_corr_fused_full(
                    pyramid.levels[0], coords1, self.corr_radius,
                    num_levels=self.corr_levels, dtype=self.dtype)
            else:
                corr = lookup_corr_fused_chunks(
                    pyramid.levels[0], coords1, self.corr_radius,
                    num_levels=self.corr_levels, dtype=self.dtype)
        elif self.corr_impl == "mxu" and self.corr_levels > 1:
            # per-level MXU lookups emitted as query-space chunks: the motion
            # encoder folds channel order + NHWC repack into its convc1
            # kernel, same as the fused path (the per-level (B,Q,9,9) ->
            # (B,H,W,81) reshapes cost ~5 ms/train-step, round-3 xprof)
            from ..ops.corr import lookup_corr_mxu_chunks

            pyramid = CorrPyramid(levels=levels, radius=self.corr_radius)
            corr = lookup_corr_mxu_chunks(pyramid, coords1, dtype=self.dtype)
        else:
            pyramid = CorrPyramid(levels=levels, radius=self.corr_radius)
            corr = lookup_corr_pyramid(
                pyramid, coords1, impl=self.corr_impl, num_levels=self.corr_levels
            ).astype(self.dtype)
        flow = (coords1 - coords0).astype(self.dtype)

        # fused (eval) lookup -> the Pallas fold kernel is the measured
        # default for convc1's chunk consumer (BENCH.md Finding 10)
        fold_impl = "pallas" if self.corr_impl == "fused" else "xla"
        if self.small:
            block = SmallUpdateBlock(
                self.corr_levels, self.corr_radius, self.hidden_dim,
                name="update_block", dtype=self.dtype, fold_impl=fold_impl,
            )
            net, up_mask, delta_flow = block(net, inp, corr, flow)
        else:
            block = BasicUpdateBlock(
                self.corr_levels, self.corr_radius, self.hidden_dim,
                name="update_block", dtype=self.dtype, fold_impl=fold_impl,
            )
            # test mode consumes only the FINAL iteration's upsample mask:
            # skip the ~6 GFLOP mask head on the other iterations
            net, up_mask, delta_flow = block(
                net, inp, corr, flow,
                mask_needed=None if self.emit_upsampled else is_last,
            )
        coords1 = coords1 + delta_flow.astype(jnp.float32)

        if up_mask is None:
            mask_state = carry[2]  # stays None for the small model
            flow_up = upflow8(coords1 - coords0) if self.emit_upsampled else None
        else:
            mask_state = up_mask.astype(jnp.float32)
            # compact (B, H, W, 64, 2) form: the depth-to-space runs ONCE
            # on the stacked iterations after the scan (see RAFT.__call__)
            flow_up = (
                convex_upsample_flat(coords1 - coords0, mask_state)
                if self.emit_upsampled
                else None
            )
        return (net, coords1, mask_state), flow_up


class RAFT(nn.Module):
    """RAFT core with optional inside-fusion CCE encoders (`raft.py:40-236`)."""

    in_channels: int = 3
    small: bool = False
    dropout: float = 0.0
    abandon_fnet: bool = False
    inside_fusion: Optional[str] = None  # None | 'parallel'
    fuse_cnet: bool = False
    mask_channel: int = 3
    fusion_type: str = "1x1conv"
    corr_impl: str = "xla"
    alt_corr: bool = False
    alt_corr_chunk: int = 2048
    freeze_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image1: jnp.ndarray,
        image2: jnp.ndarray,
        mask1: Optional[jnp.ndarray] = None,
        mask2: Optional[jnp.ndarray] = None,
        iters: int = 12,
        flow_init: Optional[jnp.ndarray] = None,
        test_mode: bool = False,
        train: bool = False,
    ):
        d = self.dtype
        if self.small:
            hdim, cdim, corr_levels, corr_radius = 96, 64, 4, 3
        else:
            hdim, cdim, corr_levels, corr_radius = 128, 128, 4, 4

        image1 = image1.astype(d)
        image2 = image2.astype(d)

        # ---- feature network (batch-concat both frames: one MXU-friendly pass)
        if self.abandon_fnet:
            proj = ChannelProject(self.in_channels, 128 if self.small else 256,
                                  name="channel_pjt", dtype=d)
            fmaps = proj(jnp.concatenate([image1, image2], axis=0))
        elif self.inside_fusion == "parallel":
            fnet = BasicParallelFusionLayer(
                img_channel=3, mask_channel=self.mask_channel, output_dim=256,
                norm_fn="instance", dropout=self.dropout,
                fusion_type=self.fusion_type, freeze_bn=self.freeze_bn,
                name="fnet", dtype=d,
            )
            fmaps = fnet(
                jnp.concatenate([image1, image2], axis=0),
                jnp.concatenate([mask1.astype(d), mask2.astype(d)], axis=0),
                train=train,
            )
        else:
            enc = (SmallEncoder if self.small else BasicEncoder)
            fnet = enc(
                self.in_channels, output_dim=128 if self.small else 256,
                norm_fn="instance", dropout=self.dropout,
                freeze_bn=self.freeze_bn, name="fnet", dtype=d,
            )
            fmaps = fnet(jnp.concatenate([image1, image2], axis=0), train=train)
        fmap1, fmap2 = jnp.split(fmaps.astype(jnp.float32), 2, axis=0)

        # 'fused' skips pyramid pooling: all levels are looked up straight
        # from the level-0 volume via pool-composed block-tent weights.
        # Despite 4.6x the MXU FLOPs of per-level 'mxu' it measures FASTER
        # for inference on v5e (23.6 vs 22.1 fps, BENCH.md round 2): its
        # (B,Q,36,W2) intermediates keep full lanes where the per-level form
        # makes XLA pad (B,Q,H2,9) tiles, and the pooling pass disappears.
        # In TRAINING the extra FLOPs hit the backward too and it loses
        # (480 vs 466 ms/step), so 'auto' resolves by mode.
        if self.corr_impl == "auto" and corr_levels > 1:
            impl = "mxu" if train else "fused"
        else:
            impl = self.corr_impl
        if self.alt_corr and corr_levels > 1:
            # ALT_CORR (`corr.py:63-91`): no volume, no pyramid — the scan
            # consts carry the feature maps and each iteration recomputes
            # its windowed correlations chunk-wise on the MXU
            b_, h_, w_, c_ = fmap1.shape
            scan_levels = (fmap1.reshape(b_, h_ * w_, c_).astype(d),
                           fmap2.astype(d))
        else:
            corr0 = all_pairs_corr(fmap1, fmap2)
            if impl != "xla" and d == jnp.bfloat16:
                corr0 = corr0.astype(jnp.bfloat16)
            # optional spatial sharding of the O((HW)^2) volume over the
            # mesh's `model` axis (train/mesh.py::spatial_sharding; §5.7)
            from ..train.mesh import shard_queries

            corr0 = shard_queries(corr0, axis=1)
            fused = impl == "fused" and corr_levels > 1
            import os as _os

            if (fused and not train
                    and _os.environ.get("FF_CORR_Q8", "0") in ("1", "mxu8")):
                # opt-in int8 volume (eval only): per-row quantization once
                # per forward; stage 1 of every iteration's lookup then
                # reads half the HBM bytes (ops/corr.py::quantize_corr_q8)
                from ..ops.corr import quantize_corr_q8

                c_i8, c_scale = quantize_corr_q8(corr0.astype(jnp.float32))
                scan_levels = (shard_queries(c_i8, axis=1),
                               shard_queries(c_scale, axis=1))
            else:
                pyramid = corr_pyramid(corr0, corr_levels, corr_radius,
                                       fused=fused)
                scan_levels = pyramid.levels

        # ---- context network
        cnet_norm = "none" if self.small else "batch"
        if self.inside_fusion == "parallel" and self.fuse_cnet:
            cnet_mod = BasicParallelFusionLayer(
                img_channel=3, mask_channel=self.mask_channel, output_dim=hdim + cdim,
                norm_fn=cnet_norm, dropout=self.dropout,
                fusion_type=self.fusion_type, freeze_bn=self.freeze_bn,
                name="cnet", dtype=d,
            )
            cnet = cnet_mod(image1, mask1.astype(d), train=train)
        else:
            enc = (SmallEncoder if self.small else BasicEncoder)
            cnet_mod = enc(
                3 if self.inside_fusion == "parallel" else self.in_channels,
                output_dim=hdim + cdim, norm_fn=cnet_norm,
                dropout=self.dropout, freeze_bn=self.freeze_bn,
                name="cnet", dtype=d,
            )
            cnet = cnet_mod(image1, train=train)
        net = jnp.tanh(cnet[..., :hdim])
        inp = nn.relu(cnet[..., hdim:])

        # ---- iterative refinement (lax.scan)
        b, h, w = fmap1.shape[:3]
        coords0 = coords_grid(b, h, w)
        coords1 = coords0 if flow_init is None else coords0 + flow_init

        Step = nn.scan(
            RAFTStep,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=(0, nn.broadcast),
            out_axes=0,
            length=iters,
        )
        step = Step(
            small=self.small,
            corr_levels=corr_levels,
            corr_radius=corr_radius,
            hidden_dim=hdim,
            emit_upsampled=not test_mode,
            corr_impl=impl,
            alt_corr=self.alt_corr and corr_levels > 1,
            alt_corr_chunk=self.alt_corr_chunk,
            dtype=d,
            name="update_step",
        )
        mask_state0 = None if self.small else jnp.zeros((b, h, w, 64 * 9), jnp.float32)
        is_last = jnp.arange(iters) == iters - 1
        (net, coords1, mask_state), flows = step(
            (net, coords1, mask_state0), is_last, (inp, coords0, scan_levels)
        )

        if test_mode:
            flow_lr = coords1 - coords0
            if self.small:
                flow_up = upflow8(flow_lr)
            else:
                flow_up = convex_upsample(flow_lr, mask_state)
            return flow_lr, flow_up
        if not self.small:
            flows = depth_to_space_flow(flows)  # one rearrange for all iters
        return flows  # (iters, B, 8h, 8w, 2)


class FFRaft(nn.Module):
    """FF_RAFT_FUSION equivalent (`ff_raft.py:75-160`): mask modality prep,
    [-1, 1] normalization, and the (optionally CCE-fused) RAFT core, exposed
    with the reference's forward signature."""

    cfg: FFRaftConfig

    @nn.compact
    def __call__(
        self,
        image1: jnp.ndarray,
        image2: jnp.ndarray,
        mask1: Optional[jnp.ndarray] = None,
        mask2: Optional[jnp.ndarray] = None,
        iters: Optional[int] = None,
        flow_init: Optional[jnp.ndarray] = None,
        test_mode: bool = False,
        train: bool = False,
    ):
        cfg = self.cfg
        iters = cfg.iters if iters is None else iters
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        if cfg.fusion is not None:
            mask1, mask2 = init_mask(
                image1, image2, mask1, mask2,
                mask_modal=cfg.mask_modal, mask_channel=cfg.mask_channel,
                mask_dilate=cfg.mask_dilate, kernel_size=cfg.kernel_size,
                kernel_sigma=cfg.kernel_sigma,
                # the CCE folds single-channel masks into its stem kernel
                # (TiledInputConv) — skip the full-res C-channel tile there;
                # the attention/conv front-ends consume C channels directly
                tile_channels=cfg.fusion != "parallel",
            )
            mask1 = 2 * (mask1 / 255.0) - 1.0
            mask2 = 2 * (mask2 / 255.0) - 1.0
        image1 = 2 * (image1 / 255.0) - 1.0
        image2 = 2 * (image2 / 255.0) - 1.0

        # 'attention'/'conv' front-ends produce fused feature images and feed
        # a vanilla RAFT with in_channels=FUSION_CHANNEL (`ff_raft.py:84-104,
        # 147-158`)
        if cfg.fusion == "attention":
            from .frontends import FusionLayer

            fusion_layer = FusionLayer(img_channel=3, mask_channel=3,
                                       wf=cfg.fusion_channel,
                                       name="fusion_layer", dtype=dtype)
            f1 = fusion_layer(image1, mask1)
            f2 = fusion_layer(image2, mask2)
        elif cfg.fusion == "conv":
            from .frontends import ConvFusionLayer

            fusion_layer = ConvFusionLayer(cfg.fusion_channel,
                                           name="fusion_layer", dtype=dtype)
            f1 = fusion_layer(image1, mask1, train=train)
            f2 = fusion_layer(image2, mask2, train=train)
        else:
            f1, f2 = image1, image2

        flow_net = RAFT(
            in_channels=cfg.fusion_channel if cfg.fusion in ("attention", "conv") else 3,
            small=cfg.small,
            dropout=cfg.dropout,
            abandon_fnet=cfg.abandon_fnet,
            inside_fusion="parallel" if cfg.fusion == "parallel" else None,
            fuse_cnet=cfg.fuse_cnet,
            mask_channel=cfg.mask_channel,
            fusion_type=cfg.fusion_type,
            corr_impl=cfg.corr_impl,
            alt_corr=cfg.alt_corr,
            alt_corr_chunk=cfg.alt_corr_chunk,
            freeze_bn=cfg.freeze_bn,
            name="flow_net",
            dtype=dtype,
        )
        if cfg.fusion == "parallel":
            return flow_net(image1, image2, mask1, mask2, iters=iters,
                            flow_init=flow_init, test_mode=test_mode, train=train)
        return flow_net(f1, f2, iters=iters, flow_init=flow_init,
                        test_mode=test_mode, train=train)
