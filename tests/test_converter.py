"""Unit tests for the torch-key mapping rules of the checkpoint importer."""

import pytest

from focusflow_official_tpu.compat import torch_key_for_path


@pytest.mark.parametrize("path,collection,want", [
    # RAFT core
    (("flow_net", "fnet", "layer1_0", "conv1", "kernel"), "params",
     "flow_net.fnet.layer1.0.conv1.weight"),
    (("flow_net", "fnet", "mask_layer2_1", "norm1", "scale"), "params",
     "flow_net.fnet.mask_layer2.1.norm1.weight"),
    (("flow_net", "fnet", "layer2_0", "downsample_conv", "kernel"), "params",
     "flow_net.fnet.layer2.0.downsample.0.weight"),
    (("flow_net", "update_step", "update_block", "gru", "convz1", "bias"), "params",
     "flow_net.update_block.gru.convz1.bias"),
    (("flow_net", "update_step", "update_block", "mask_0", "kernel"), "params",
     "flow_net.update_block.mask.0.weight"),
    (("flow_net", "cnet", "norm1", "mean"), "batch_stats",
     "flow_net.cnet.norm1.running_mean"),
    # fusion units
    (("flow_net", "fnet", "fusion1", "mask2img", "conv", "kernel"), "params",
     "flow_net.fnet.fusion1.mask2img.conv.weight"),
    (("flow_net", "fnet", "fusion3", "img2mask", "c_map_0", "bias"), "params",
     "flow_net.fnet.fusion3.img2mask.c_map.0.bias"),
    (("flow_net", "fnet", "fusion3", "img2mask", "conv_v_0", "kernel"), "params",
     "flow_net.fnet.fusion3.img2mask.conv_v.0.weight"),
    # PWC
    (("netExtractor", "netOne_0", "kernel"), "params",
     "netExtractor.netOne.0.weight"),
    (("netExtractor", "mask_netThr_4", "bias"), "params",
     "netExtractor.mask_netThr.4.bias"),
    (("netTwo", "netUpflow", "kernel"), "params", "netTwo.netUpflow.weight"),
    (("netRefiner", "netMain_12", "kernel"), "params",
     "netRefiner.netMain.12.weight"),
    # attention front-end: literal names that must NOT be split
    (("fusion_layer", "down_path_1_0", "conv_1", "kernel"), "params",
     "fusion_layer.down_path_1.0.conv_1.weight"),
    (("fusion_layer", "conv_01", "kernel"), "params", "fusion_layer.conv_01.weight"),
    (("fusion_layer", "skip_conv_1_0", "kernel"), "params",
     "fusion_layer.skip_conv_1.0.weight"),
    # mask-image transformer: LayerNorm body + raw params + Linear
    (("down_path_1_1", "image_event_transformer", "norm1_image_body", "scale"),
     "params", "down_path_1.1.image_event_transformer.norm1_image.body.weight"),
    (("attn", "temperature"), "params", "attn.temperature"),
    (("ffn", "fc1", "kernel"), "params", "ffn.fc1.weight"),
])
def test_torch_key_mapping(path, collection, want):
    assert torch_key_for_path(path, collection) == want


def test_timm_twins_structural_roundtrip():
    """Build a fake timm-shaped state_dict and map it onto TwinsSVT2Stage."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from focusflow_official_tpu.compat.timm_twins import timm_twins_to_variables
    from focusflow_official_tpu.nn.twins import TwinsSVT2Stage

    model = TwinsSVT2Stage()
    x = jnp.zeros((1, 64, 64, 3))
    template = model.init(jax.random.PRNGKey(0), x)["params"]

    rng = np.random.RandomState(0)
    sd = {}
    dims = [(128, 3, 4), (256, 128, 2)]  # (dim, in, patch)
    heads = [4, 8]
    for s, (dim, cin, p) in enumerate(dims):
        sd[f"patch_embeds.{s}.proj.weight"] = rng.randn(dim, cin, p, p).astype(np.float32)
        sd[f"patch_embeds.{s}.proj.bias"] = rng.randn(dim).astype(np.float32)
        sd[f"patch_embeds.{s}.norm.weight"] = rng.randn(dim).astype(np.float32)
        sd[f"patch_embeds.{s}.norm.bias"] = rng.randn(dim).astype(np.float32)
        sd[f"pos_block.{s}.proj.0.weight"] = rng.randn(dim, 1, 3, 3).astype(np.float32)
        sd[f"pos_block.{s}.proj.0.bias"] = rng.randn(dim).astype(np.float32)
        for j in range(2):
            bk = f"blocks.{s}.{j}"
            for norm in ("norm1", "norm2"):
                sd[f"{bk}.{norm}.weight"] = rng.randn(dim).astype(np.float32)
                sd[f"{bk}.{norm}.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{bk}.mlp.fc1.weight"] = rng.randn(4 * dim, dim).astype(np.float32)
            sd[f"{bk}.mlp.fc1.bias"] = rng.randn(4 * dim).astype(np.float32)
            sd[f"{bk}.mlp.fc2.weight"] = rng.randn(dim, 4 * dim).astype(np.float32)
            sd[f"{bk}.mlp.fc2.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{bk}.attn.proj.weight"] = rng.randn(dim, dim).astype(np.float32)
            sd[f"{bk}.attn.proj.bias"] = rng.randn(dim).astype(np.float32)
            if j % 2 == 0:  # LSA
                sd[f"{bk}.attn.qkv.weight"] = rng.randn(3 * dim, dim).astype(np.float32)
                sd[f"{bk}.attn.qkv.bias"] = rng.randn(3 * dim).astype(np.float32)
            else:  # GSA
                sd[f"{bk}.attn.q.weight"] = rng.randn(dim, dim).astype(np.float32)
                sd[f"{bk}.attn.q.bias"] = rng.randn(dim).astype(np.float32)
                sd[f"{bk}.attn.kv.weight"] = rng.randn(2 * dim, dim).astype(np.float32)
                sd[f"{bk}.attn.kv.bias"] = rng.randn(2 * dim).astype(np.float32)
                sr = [8, 4][s]
                sd[f"{bk}.attn.sr.weight"] = rng.randn(dim, dim, sr, sr).astype(np.float32)
                sd[f"{bk}.attn.sr.bias"] = rng.randn(dim).astype(np.float32)
                sd[f"{bk}.attn.norm.weight"] = rng.randn(dim).astype(np.float32)
                sd[f"{bk}.attn.norm.bias"] = rng.randn(dim).astype(np.float32)

    params = timm_twins_to_variables(sd, template)
    np.testing.assert_array_equal(
        np.asarray(params["patch_embeds_0"]["proj"]["kernel"]),
        sd["patch_embeds.0.proj.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(params["blocks_1_1"]["attn"]["kv"]["kernel"]),
        sd["blocks.1.1.attn.kv.weight"].transpose(1, 0),
    )
    # the converted tree still runs
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)}, x)
    assert out.shape == (1, 8, 8, 256)
