"""Import timm `twins_svt_large` weights into `nn/twins.py` backbones.

The reference initializes its FlowFormer encoders from timm's
ImageNet-pretrained Twins-SVT-Large (`encoders.py:9, 134`). This converter
maps a timm state_dict (torch tensors or numpy arrays, e.g. loaded from a
downloaded checkpoint file) onto our `TwinsSVT2Stage` /
`TwinsSVT2StageCCE` parameter trees. Only the first two stages are used
(the reference deletes the rest).

timm key layout (Twins):
  patch_embeds.{s}.proj.{weight,bias}      conv patch embed
  patch_embeds.{s}.norm.{weight,bias}      LayerNorm
  blocks.{s}.{j}.norm1|norm2.{weight,bias}
  blocks.{s}.{j}.attn.qkv.{weight,bias}    LSA (even j)
  blocks.{s}.{j}.attn.q|kv.{weight,bias}   GSA (odd j)
  blocks.{s}.{j}.attn.proj.{weight,bias}
  blocks.{s}.{j}.attn.sr.{weight,bias}     GSA subsample conv
  blocks.{s}.{j}.attn.norm.{weight,bias}   GSA post-sr LayerNorm
  blocks.{s}.{j}.mlp.fc1|fc2.{weight,bias}
  pos_block.{s}.proj.0.{weight,bias}       PEG depthwise conv

This cannot be numerically validated in this environment (no timm, no
network); the mapping is exercised structurally by `tests/test_converter.py`.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
from flax import traverse_util


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv_w(a):  # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return _np(a).transpose(2, 3, 1, 0)


def _lin_w(a):  # torch (O, I) -> flax (I, O)
    return _np(a).transpose(1, 0)


def timm_twins_to_variables(state_dict: Mapping, params_template: Dict,
                            mask_branch: bool = False) -> Dict:
    """Fill a TwinsSVT2Stage(CCE) params tree from a timm Twins state_dict.

    mask_branch=True additionally initializes the `mask_*` mirror (the
    reference creates it un-pretrained, `encoders.py:134` — pass the same
    state_dict to mirror-initialize, or leave False to keep random init).
    """
    sd = {k.split("module.")[-1]: v for k, v in state_dict.items()}
    flat = dict(traverse_util.flatten_dict(params_template))
    out = dict(flat)

    def put(path, value):
        if path in flat:
            expect = np.shape(flat[path])
            assert tuple(value.shape) == tuple(expect), (path, value.shape, expect)
            out[path] = value.astype(np.asarray(flat[path]).dtype)

    def fill(prefix_flax: str):
        for s in range(2):
            pe = f"patch_embeds.{s}"
            put((f"{prefix_flax}patch_embeds_{s}", "proj", "kernel"), _conv_w(sd[f"{pe}.proj.weight"]))
            put((f"{prefix_flax}patch_embeds_{s}", "proj", "bias"), _np(sd[f"{pe}.proj.bias"]))
            put((f"{prefix_flax}patch_embeds_{s}", "norm", "scale"), _np(sd[f"{pe}.norm.weight"]))
            put((f"{prefix_flax}patch_embeds_{s}", "norm", "bias"), _np(sd[f"{pe}.norm.bias"]))

            put((f"{prefix_flax}pos_block_{s}", "proj_0", "kernel"),
                _conv_w(sd[f"pos_block.{s}.proj.0.weight"]))
            put((f"{prefix_flax}pos_block_{s}", "proj_0", "bias"),
                _np(sd[f"pos_block.{s}.proj.0.bias"]))

            for j in range(2):
                bk = f"blocks.{s}.{j}"
                fb = f"{prefix_flax}blocks_{s}_{j}"
                for norm in ("norm1", "norm2"):
                    put((fb, norm, "scale"), _np(sd[f"{bk}.{norm}.weight"]))
                    put((fb, norm, "bias"), _np(sd[f"{bk}.{norm}.bias"]))
                put((fb, "mlp", "fc1", "kernel"), _lin_w(sd[f"{bk}.mlp.fc1.weight"]))
                put((fb, "mlp", "fc1", "bias"), _np(sd[f"{bk}.mlp.fc1.bias"]))
                put((fb, "mlp", "fc2", "kernel"), _lin_w(sd[f"{bk}.mlp.fc2.weight"]))
                put((fb, "mlp", "fc2", "bias"), _np(sd[f"{bk}.mlp.fc2.bias"]))
                put((fb, "attn", "proj", "kernel"), _lin_w(sd[f"{bk}.attn.proj.weight"]))
                put((fb, "attn", "proj", "bias"), _np(sd[f"{bk}.attn.proj.bias"]))
                if f"{bk}.attn.qkv.weight" in sd:  # LSA
                    put((fb, "attn", "qkv", "kernel"), _lin_w(sd[f"{bk}.attn.qkv.weight"]))
                    put((fb, "attn", "qkv", "bias"), _np(sd[f"{bk}.attn.qkv.bias"]))
                else:  # GSA: q + kv (+ sr conv + norm)
                    put((fb, "attn", "q", "kernel"), _lin_w(sd[f"{bk}.attn.q.weight"]))
                    put((fb, "attn", "q", "bias"), _np(sd[f"{bk}.attn.q.bias"]))
                    put((fb, "attn", "kv", "kernel"), _lin_w(sd[f"{bk}.attn.kv.weight"]))
                    put((fb, "attn", "kv", "bias"), _np(sd[f"{bk}.attn.kv.bias"]))
                    if f"{bk}.attn.sr.weight" in sd:
                        put((fb, "attn", "sr", "kernel"), _conv_w(sd[f"{bk}.attn.sr.weight"]))
                        put((fb, "attn", "sr", "bias"), _np(sd[f"{bk}.attn.sr.bias"]))
                        put((fb, "attn", "norm", "scale"), _np(sd[f"{bk}.attn.norm.weight"]))
                        put((fb, "attn", "norm", "bias"), _np(sd[f"{bk}.attn.norm.bias"]))

    fill("")
    if mask_branch:
        fill("mask_")
    return traverse_util.unflatten_dict(out)
