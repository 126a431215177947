"""Import PyTorch reference checkpoints into flax variable trees.

Used for two things: (1) numeric parity gates against the reference
implementation (load the same random-init weights into both and compare
outputs), and (2) bootstrapping training from the reference's published
`.pth` checkpoints (e.g. `raft-chairs.pth`, `ff-raft/config/...`
LOAD_MODULE chains — see `raft.py:115-148`).

The flax module tree was deliberately named so torch keys map 1:1:

    flow_net.fnet.layer1.0.conv1.weight  ->  flow_net/fnet/layer1_0/conv1/kernel
    flow_net.update_block.gru.convz1.*   ->  flow_net/update_step/update_block/gru/convz1/*
    ...mask.0.weight (Sequential)        ->  .../mask_0/kernel

Tensor transforms: conv (O,I,kh,kw) -> (kh,kw,I,O); norm weight -> scale;
BatchNorm running_mean/var -> the 'batch_stats' collection. The reference's
shared downsample norm (`downsample.1` is the same module as `norm3`) is
read from the `norm3`/`norm4` key.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np
from flax import traverse_util

# flax module names that correspond to torch nn.Sequential children:
# any trailing _<digits> maps to torch's '.<digits>' (layer1_0 -> layer1.0,
# mask_0 -> mask.0, netOne_2 -> netOne.2, netMain_12 -> netMain.12, ...)
_SEQ_RE = re.compile(r"^(.+)_(\d+)$")

# ...except torch attribute names that genuinely contain a trailing _<digit>
# (the UNet fusion front-end, `fusion.py:45-47,168`) — recursion stops when
# the remaining prefix is one of these literals
_LITERAL_NAMES = {"conv_1", "conv_2", "conv_01", "down_path_1", "up_path_1",
                  "skip_conv_1", "relu_1", "relu_2"}


def _seq_expand(comp: str) -> str:
    """Expand trailing _<digits> into '.<digits>', recursively (blocks_0_1 ->
    blocks.0.1, layer1_0 -> layer1.0) but never past a literal torch
    attribute name (down_path_1_1 -> down_path_1.1)."""
    if comp in _LITERAL_NAMES:
        return comp
    m = _SEQ_RE.match(comp)
    if not m:
        return comp
    return f"{_seq_expand(m.group(1))}.{m.group(2)}"


def torch_key_for_path(path: tuple, collection: str) -> str:
    """Map a flax variable path (without collection) to the torch state_dict key."""
    comps = []
    i = 0
    while i < len(path) - 1:
        comp = path[i]
        if comp in ("update_step", "ctx"):
            # update_step: nn.scan wrapper (torch has update_block directly);
            # ctx: context-projection submodule wrapper (torch keeps
            # context_proj on the attention module itself)
            i += 1
            continue
        if comp == "downsample_conv":
            comps.append("downsample.0")
            i += 1
            continue
        if comp.endswith("_body"):  # ChannelLayerNorm: norm1_image_body -> norm1_image.body
            comps.append(comp[: -len("_body")] + ".body")
            i += 1
            continue
        if comp.endswith("_svt"):
            # FlowFormer twins wrappers: our flat `context_encoder_svt` scope
            # spans torch's {context_encoder}.{svt | mask_svt | fusion_blks}
            # (`encoders.py:6-36,131-174`). The branch is decided by the next
            # path component: mask_* -> mask_svt (prefix stripped),
            # fusion_blks* -> on the wrapper itself, else -> svt.
            base = comp[: -len("_svt")]
            comps.append(base)
            nxt = path[i + 1] if i + 1 < len(path) - 1 else path[-1]
            if isinstance(nxt, str) and nxt.startswith("fusion_blks"):
                pass  # fusion units live on the wrapper module
            elif isinstance(nxt, str) and nxt.startswith("mask_"):
                comps.append("mask_svt")
                comps.append(_seq_expand(nxt[len("mask_"):]))
                i += 2
                continue
            else:
                comps.append("svt")
            i += 1
            continue
        if comp.startswith("decoder_layer_cross_attend_"):
            # MemoryDecoderLayer cross attention (`decoder.py:29-91`)
            comps.append("decoder_layer.cross_attend."
                         + _seq_expand(comp[len("decoder_layer_cross_attend_"):]))
            i += 1
            continue
        if comp in _LITERAL_NAMES:
            comps.append(comp)
            i += 1
            continue
        comps.append(_seq_expand(comp))
        i += 1

    leaf = path[-1]
    if collection == "batch_stats":
        leaf_name = {"mean": "running_mean", "var": "running_var"}[leaf]
    elif leaf in ("pos_emb_rel_height", "pos_emb_rel_width"):
        # GMA RelPosEmb embedding tables (`gma.py:12-32`)
        leaf_name = f"pos_emb.{leaf[len('pos_emb_'):]}.weight"
    else:
        leaf_name = {"kernel": "weight", "scale": "weight", "bias": "bias"}.get(leaf, leaf)
    return ".".join(comps + [leaf_name])


def variables_to_torch_state_dict(variables: Mapping, prefix: str = "") -> Dict:
    """Export a flax variable tree to a reference-format torch state_dict
    (numpy arrays; pass through `torch.from_numpy` for `load_state_dict`).

    Exact inverse of `torch_state_dict_to_variables` — kernels transpose
    back to (O, I, kh, kw)/(out, in), batch_stats become running_mean/var,
    and the reference's shared downsample norm (`downsample.1` IS `norm3`,
    `extractor.py`) is re-emitted under both keys so a strict
    `load_state_dict` on the reference model succeeds. Lets users move
    checkpoints trained here back into the reference stack (and powers the
    same-weights eval-protocol gate, `tests/test_trained_gates.py`)."""
    sd = {}
    for col, tree in variables.items():
        flat = traverse_util.flatten_dict(tree)
        for path, leaf in flat.items():
            tkey = prefix + torch_key_for_path(path, col)
            arr = np.asarray(leaf)
            if path[-1] == "kernel" and arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
            elif path[-1] == "kernel" and arr.ndim == 2:
                arr = arr.transpose(1, 0)
            sd[tkey] = arr
    # shared downsample norm: duplicate norm3/norm4 under downsample.1
    for k in [k for k in sd if k.endswith("downsample.0.weight")]:
        base = k[: -len("downsample.0.weight")]
        for norm in ("norm3", "norm4"):
            for suf in ("weight", "bias", "running_mean", "running_var"):
                nk = f"{base}{norm}.{suf}"
                if nk in sd:
                    sd[f"{base}downsample.1.{suf}"] = sd[nk]
    return sd


def torch_state_dict_to_variables(
    state_dict: Mapping[str, "object"],
    variables_template: Mapping,
    strict: bool = True,
    prefix: str = "",
) -> Dict:
    """Fill a flax variables template ({'params': ..., 'batch_stats': ...})
    from a torch state_dict (tensors or numpy arrays).

    `prefix` is prepended to every torch key (e.g. 'flow_net.' when loading a
    bare RAFT state_dict into an FFRaft tree). 'module.' prefixes (DDP) are
    stripped, mirroring `raft.py:118-121`.
    """
    sd = {}
    for k, v in state_dict.items():
        k = k[len("module.") :] if k.startswith("module.") else k
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        sd[k] = arr

    flat_out = {}
    for col, tree in variables_template.items():
        flat = traverse_util.flatten_dict(tree)
        for path, template_leaf in flat.items():
            tkey = prefix + torch_key_for_path(path, col)
            if tkey not in sd:
                if strict:
                    raise KeyError(
                        f"torch key '{tkey}' (for {col}/{'/'.join(path)}) not found; "
                        f"available sample: {list(sd)[:5]}"
                    )
                flat_out[(col,) + path] = template_leaf
                continue
            arr = sd[tkey]
            if path[-1] == "kernel" and arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)
            elif path[-1] == "kernel" and arr.ndim == 2:
                arr = arr.transpose(1, 0)  # nn.Linear (out, in) -> Dense (in, out)
            expected = np.shape(template_leaf)
            if tuple(arr.shape) != tuple(expected):
                raise ValueError(
                    f"shape mismatch for {tkey}: torch {arr.shape} vs flax {expected}"
                )
            flat_out[(col,) + path] = arr.astype(np.asarray(template_leaf).dtype)

    nested = traverse_util.unflatten_dict(flat_out)
    return {col: nested.get(col, {}) for col in variables_template}
