"""Checkpoint surgery and freeze masks — parameter-level transfer learning.

Pure-pytree equivalents of the reference's in-module mutations:

- `copy_to_branch`: initialize the CCE mask branch from the image branch
  (`parallel_fusion.py:269-274`, driven by MODEL.LOAD_MODULE_TO_BRANCH,
  `raft.py:126-128`).
- `drop_first_convs`: the 'backend' partial load that discards fnet/cnet
  conv1 when the input channel count changes (`raft.py:130-148`).
- `freeze_mask_for_parallel`: the FREEZE_MODULE prompt-tuning mode — freeze
  the image branches of fnet/cnet and the update block except flow_head
  (`parallel_fusion.py:249-267`, `update.py:137-146`). Returned as an optax
  label tree ('frozen' / 'trainable') for `optax.multi_transform`.
"""

from __future__ import annotations

from typing import Dict

from flax import traverse_util


_BRANCH_COPY_PREFIXES = [
    ("mask_conv1", "conv1"),
    ("mask_layer1_0", "layer1_0"), ("mask_layer1_1", "layer1_1"),
    ("mask_layer2_0", "layer2_0"), ("mask_layer2_1", "layer2_1"),
    ("mask_layer3_0", "layer3_0"), ("mask_layer3_1", "layer3_1"),
    ("mask_conv2", "conv2"),
]


def copy_to_branch(variables: Dict) -> Dict:
    """Copy image-branch weights into the mask branch of every CCE encoder."""
    out = {}
    for col, tree in variables.items():
        flat = dict(traverse_util.flatten_dict(tree))
        updates = {}
        for path in flat:
            for dst, src in _BRANCH_COPY_PREFIXES:
                if dst in path:
                    i = path.index(dst)
                    src_path = path[:i] + (src,) + path[i + 1 :]
                    if src_path in flat:
                        updates[path] = flat[src_path]
        flat.update(updates)
        out[col] = traverse_util.unflatten_dict(flat)
    return out


def drop_first_convs(torch_state_dict: Dict) -> Dict:
    """'backend' load mode: drop fnet/cnet conv1 weights (`raft.py:130-148`)."""
    drop = {
        "fnet.conv1.weight", "fnet.conv1.bias",
        "cnet.conv1.weight", "cnet.conv1.bias",
    }
    return {k: v for k, v in torch_state_dict.items()
            if k.split("module.")[-1] not in drop}


def _is_image_branch_cce(path) -> bool:
    """Image-branch components of a CCE encoder (`parallel_fusion.py:249-267`)."""
    for comp in path:
        if comp in ("conv1", "norm1", "conv2") or comp.startswith("layer"):
            return True
    return False


def freeze_mask_for_parallel(params: Dict) -> Dict:
    """Label tree for FREEZE_MODULE=true prompt-tuning: 'frozen'/'trainable'.

    Freezes: fnet/cnet image branches (mask branch + fusion units stay
    trainable) and the update block's encoder + gru (flow_head trainable).
    """
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        frozen = False
        if "fnet" in path or "cnet" in path:
            sub = path[path.index("fnet" if "fnet" in path else "cnet") + 1 :]
            frozen = _is_image_branch_cce(sub)
        if "update_block" in path:
            i = path.index("update_block")
            frozen = path[i + 1] in ("encoder", "gru")
        labels[path] = "frozen" if frozen else "trainable"
    return traverse_util.unflatten_dict(labels)


def flow_net_lr_labels(params: Dict) -> Dict:
    """'encoder'/'trainable' labels for TRAIN.SEPARATE_LR.

    The reference (`ff-raft/train.py:211-233`) gives `model.flow_net` its own
    AdamW + OneCycleLR pair at LR/10 while `fusion_layer` trains at LR.
    OneCycleLR is linear in max_lr, so the second optimizer is exactly an
    0.1x lr factor on the flow_net subtree — expressed here as the same
    label-tree mechanism as FlowFormer's twins_lr_factor (the 'encoder'
    group gets `encoder_lr_factor` x lr in `build_optimizer`).
    """
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        labels[path] = "encoder" if "flow_net" in path else "trainable"
    return traverse_util.unflatten_dict(labels)


def encoder_lr_labels(params: Dict) -> Dict:
    """'encoder'/'trainable' labels for FlowFormer's twins_lr_factor param
    groups: pretrained feat/context encoders get the scaled LR
    (`ff-flowformer/FF_FlowFormer_Core/optimizer/__init__.py:22-32`)."""
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        enc = any(("feat_encoder" in comp or "context_encoder" in comp)
                  for comp in path)
        labels[path] = "encoder" if enc else "trainable"
    return traverse_util.unflatten_dict(labels)
