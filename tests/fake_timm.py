"""Minimal torch `timm` stand-in for reference-parity tests.

The reference FlowFormer imports timm for (a) `create_model('twins_svt_large')`
truncated to 2 stages (`FF_FlowFormer_Core/FlowFormer/encoders.py:6-36`) and
(b) a few layer helpers. timm isn't installed here, so this module provides a
torch implementation of the Twins-SVT-Large forward (first two stages; the
deleted stages are parameter-free placeholders) with timm's exact module
names, so `state_dict()` keys match what `compat/timm_twins.py` expects and
the reference code's attribute surgery (`del svt.blocks[2]`...) works.

Install with `install_fake_timm()` BEFORE importing the reference — the same
dependency-stubbing pattern as `test_pwc_parity.py` uses for cupy.

Semantics mirror the public Twins paper / timm config for twins_svt_large
(embed_dims 128/256/512/1024, heads 4/8/16/32, depths 2/2/18/2, sr 8/4/2/1,
ws 7, mlp_ratio 4, LayerNorm eps 1e-6, GELU): LSA = full attention inside
7x7 zero-padded windows; GSA = queries vs sr-strided conv-subsampled k/v;
PEG = residual depthwise 3x3 conv after block 0 of each stage.
"""

import math
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


def to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    with torch.no_grad():
        tensor.normal_(mean, std).clamp_(a * std, b * std)
    return tensor


class DropPath(nn.Module):
    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        return x  # eval-only parity harness


class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, drop=0.0):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden_features, out_features)
        self.drop = nn.Dropout(drop)

    def forward(self, x):
        return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))


class Attention(nn.Module):
    """Standard ViT attention (timm.models.vision_transformer.Attention)."""

    def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                 proj_drop=0.0, **_):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, c // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class _LSA(nn.Module):
    def __init__(self, dim, num_heads, ws=7):
        super().__init__()
        self.num_heads, self.ws = num_heads, ws
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, size):
        b, n, c = x.shape
        h, w = size
        ws, nh = self.ws, self.num_heads
        x = x.reshape(b, h, w, c)
        pad_b, pad_r = (ws - h % ws) % ws, (ws - w % ws) % ws
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        hp, wp = h + pad_b, w + pad_r
        x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, -1, ws * ws, c)
        qkv = self.qkv(x).reshape(b, x.shape[1], ws * ws, 3, nh, c // nh)
        q, k, v = qkv.permute(3, 0, 1, 4, 2, 5).unbind(0)  # (b,nw,nh,T,hd)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(2, 3).reshape(b, -1, ws * ws, c)
        out = out.reshape(b, hp // ws, wp // ws, ws, ws, c).permute(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, hp, wp, c)[:, :h, :w].reshape(b, n, c)
        return self.proj(out)


class _GSA(nn.Module):
    def __init__(self, dim, num_heads, sr_ratio=1):
        super().__init__()
        self.num_heads, self.sr_ratio = num_heads, sr_ratio
        self.scale = (dim // num_heads) ** -0.5
        self.q = nn.Linear(dim, dim, bias=True)
        self.kv = nn.Linear(dim, dim * 2, bias=True)
        self.proj = nn.Linear(dim, dim)
        if sr_ratio > 1:
            self.sr = nn.Conv2d(dim, dim, kernel_size=sr_ratio, stride=sr_ratio)
            self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, size):
        b, n, c = x.shape
        h, w = size
        nh = self.num_heads
        q = self.q(x).reshape(b, n, nh, c // nh).permute(0, 2, 1, 3)
        if self.sr_ratio > 1:
            xs = x.permute(0, 2, 1).reshape(b, c, h, w)
            xs = self.sr(xs).reshape(b, c, -1).permute(0, 2, 1)
            xs = self.norm(xs)
        else:
            xs = x
        kv = self.kv(xs).reshape(b, -1, 2, nh, c // nh).permute(2, 0, 3, 1, 4)
        k, v = kv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class _Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, sr_ratio=1, ws=None):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        if ws is not None and ws > 1:
            self.attn = _LSA(dim, num_heads, ws)
        else:
            self.attn = _GSA(dim, num_heads, sr_ratio)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x, size):
        x = x + self.attn(self.norm1(x), size)
        x = x + self.mlp(self.norm2(x))
        return x


class _PosConv(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = nn.Sequential(nn.Conv2d(dim, dim, 3, 1, 1, groups=dim))

    def forward(self, x, size):
        b, n, c = x.shape
        h, w = size
        feat = x.transpose(1, 2).reshape(b, c, h, w)
        return (self.proj(feat) + feat).flatten(2).transpose(1, 2)


class _PatchEmbed(nn.Module):
    def __init__(self, patch_size, in_chans, embed_dim):
        super().__init__()
        self.proj = nn.Conv2d(in_chans, embed_dim, patch_size, patch_size)
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)

    def forward(self, x):
        x = self.proj(x)
        b, c, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)
        return self.norm(x), (h, w)


class _Twins(nn.Module):
    """twins_svt_large. Stages 3/4 are built (so `del` surgery works) but
    tiny, since every consumer deletes them before use."""

    _DIMS = (128, 256, 512, 1024)
    _HEADS = (4, 8, 16, 32)
    _DEPTHS = (2, 2, 18, 2)
    _SR = (8, 4, 2, 1)
    _PATCH = (4, 2, 2, 2)
    _WS = 7

    def __init__(self, in_chans=3):
        super().__init__()
        self.depths = list(self._DEPTHS)
        self.patch_embeds = nn.ModuleList()
        self.blocks = nn.ModuleList()
        self.pos_block = nn.ModuleList()
        self.pos_drops = nn.ModuleList()
        prev = in_chans
        for s, dim in enumerate(self._DIMS):
            self.patch_embeds.append(_PatchEmbed(self._PATCH[s], prev, dim))
            depth = self._DEPTHS[s] if s < 2 else 1  # stages 3/4: placeholders
            self.blocks.append(nn.ModuleList([
                _Block(dim, self._HEADS[s], 4.0, self._SR[s],
                       self._WS if j % 2 == 0 else 1)
                for j in range(depth)
            ]))
            self.pos_block.append(_PosConv(dim))
            self.pos_drops.append(nn.Dropout(0.0))
            prev = dim
        self.head = nn.Linear(self._DIMS[-1], 1000)
        self.apply(self._init)

    @staticmethod
    def _init(m):
        if isinstance(m, nn.Linear):
            trunc_normal_(m.weight, std=0.02)
            if m.bias is not None:
                nn.init.zeros_(m.bias)
        elif isinstance(m, nn.Conv2d):
            fan_out = m.kernel_size[0] * m.kernel_size[1] * m.out_channels
            fan_out //= m.groups
            m.weight.data.normal_(0, math.sqrt(2.0 / fan_out))
            if m.bias is not None:
                m.bias.data.zero_()


def create_model(name, pretrained=False, **kwargs):
    if not name.startswith("twins_svt_large"):
        raise ValueError(f"fake timm only provides twins_svt_large, got {name}")
    # pretrained=True: no network here; random init — parity tests export
    # whatever weights this instance holds and import them on the JAX side.
    return _Twins()


def install_fake_timm():
    """Register this module as `timm` (+ submodules) in sys.modules."""
    timm = types.ModuleType("timm")
    timm.create_model = create_model

    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)

    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.Mlp = Mlp
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.activations = types.SimpleNamespace(GELU=nn.GELU)
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn
    vit = types.ModuleType("timm.models.vision_transformer")
    vit.Attention = Attention

    models.layers = layers
    models.registry = registry
    models.vision_transformer = vit
    timm.data = data
    timm.models = models

    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.data", data)
    sys.modules.setdefault("timm.models", models)
    sys.modules.setdefault("timm.models.layers", layers)
    sys.modules.setdefault("timm.models.registry", registry)
    sys.modules.setdefault("timm.models.vision_transformer", vit)
    return timm
