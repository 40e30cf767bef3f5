"""FULL-graph DPT oracle vs the ACTUAL reference model (VERDICT round-3 item 4).

The round-3 decoder oracle (test_dpt_decoder_oracle.py) pinned every module in
isolation, but nothing ever ran the reference's *assembled* graph — hybrid-stem
feature taps -> forward-hook capture -> forward_flex -> act_postprocess ->
RefineNet -> head (`DPT/dpt/models.py:93-212`, `vit.py:104-204,351-510`) —
because `_make_pretrained_vitb_rn50_384` needs timm. These tests close that
gap without timm: a plain-torch SURROGATE exposing exactly the attribute
surface `_make_vit_b_rn50_backbone` hooks into (patch_embed.backbone with
ResNetV2 stem+stages, patch_embed.proj, blocks, norm, pos_embed, cls_token)
is injected through a stubbed `timm.create_model`, so `DPTDepthModel`
constructs and runs the reference's REAL wiring end-to-end with random
weights; the surrogate's state dict flows through `convert_torch_state_dict`
and the whole forward is asserted against our `models/dpt.py`. After this,
the only unverified DPT surface is real timm's own numerics (absent from
this image).
"""

from __future__ import annotations

import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from test_reference_oracle import _stub_module

REF = "/root/reference"

pytestmark = [pytest.mark.oracle, pytest.mark.slow]


# --------------------------------------------------------------- surrogate
# Semantics mirror timm's vit_base_resnet50_384 as reimplemented (and
# documented) in nope_nerf_tpu/models/dpt.py: weight-standardized TF-'SAME'
# convs, GroupNorm(32)+ReLU, non-preact bottlenecks with stages (3,4,9),
# pre-LN ViT blocks with exact GELU. State-dict key names match the MiDaS
# checkpoint layout that convert_torch_state_dict consumes.

def _pad_same(x, k, s):
    h, w = x.shape[-2:]
    ph = max((math.ceil(h / s) - 1) * s + k - h, 0)
    pw = max((math.ceil(w / s) - 1) * s + k - w, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class _StdConvSame(nn.Conv2d):
    def __init__(self, cin, cout, k, stride=1):
        super().__init__(cin, cout, k, stride=stride, bias=False)

    def forward(self, x):
        w = self.weight
        mean = w.mean(dim=[1, 2, 3], keepdim=True)
        var = w.var(dim=[1, 2, 3], unbiased=False, keepdim=True)
        w = (w - mean) / torch.sqrt(var + 1e-8)
        x = _pad_same(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, w, None, self.stride, 0)


class _GNAct(nn.GroupNorm):
    def __init__(self, c, act=True):
        super().__init__(32, c, eps=1e-5)
        self._act = act

    def forward(self, x):
        y = super().forward(x)
        return F.relu(y) if self._act else y


class _Downsample(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv = _StdConvSame(cin, cout, 1, stride)
        self.norm = _GNAct(cout, act=False)

    def forward(self, x):
        return self.norm(self.conv(x))


class _Bottleneck(nn.Module):
    def __init__(self, cin, mid, cout, stride, has_down):
        super().__init__()
        self.conv1 = _StdConvSame(cin, mid, 1, 1)
        self.norm1 = _GNAct(mid)
        self.conv2 = _StdConvSame(mid, mid, 3, stride)
        self.norm2 = _GNAct(mid)
        self.conv3 = _StdConvSame(mid, cout, 1, 1)
        self.norm3 = _GNAct(cout, act=False)
        self.downsample = _Downsample(cin, cout, stride) if has_down else None

    def forward(self, x):
        sc = self.downsample(x) if self.downsample is not None else x
        y = self.norm1(self.conv1(x))
        y = self.norm2(self.conv2(y))
        y = self.norm3(self.conv3(y))
        return F.relu(y + sc)


class _Stage(nn.Module):
    def __init__(self, cin, mid, cout, n_blocks, stride):
        super().__init__()
        blocks = [_Bottleneck(cin, mid, cout, stride, True)]
        blocks += [_Bottleneck(cout, mid, cout, 1, False)
                   for _ in range(n_blocks - 1)]
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class _Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = _StdConvSame(3, 64, 7, 2)
        self.norm = _GNAct(64)

    def forward(self, x):
        x = self.norm(self.conv(x))
        x = _pad_same(x, 3, 2)
        # zero-pad == -inf-pad here: the input is post-ReLU (>= 0), so border
        # zeros can never beat a real value in the max window
        return F.max_pool2d(x, 3, 2)


class _ResNetV2(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = _Stem()
        self.stages = nn.ModuleList([
            _Stage(64, 64, 256, 3, 1),
            _Stage(256, 128, 512, 4, 2),
            _Stage(512, 256, 1024, 9, 2),
        ])

    def forward(self, x):
        x = self.stem(x)
        for st in self.stages:
            x = st(x)
        return x


class _PatchEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = _ResNetV2()
        self.proj = nn.Conv2d(1024, 768, 1, 1)


class _Attention(nn.Module):
    def __init__(self, dim=768, heads=12):
        super().__init__()
        self.num_heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, d = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, d // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1)) * self.scale
        att = att.softmax(dim=-1)
        y = (att @ v).transpose(1, 2).reshape(b, n, d)
        return self.proj(y)


class _Mlp(nn.Module):
    def __init__(self, dim=768, ratio=4):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim * ratio)
        self.fc2 = nn.Linear(dim * ratio, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _Block(nn.Module):
    def __init__(self, dim=768):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _Attention(dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _SurrogateHybridViT(nn.Module):
    """timm vit_base_resnet50_384 attribute surface, plain torch."""

    def __init__(self):
        super().__init__()
        self.patch_embed = _PatchEmbed()
        self.blocks = nn.ModuleList([_Block() for _ in range(12)])
        self.norm = nn.LayerNorm(768, eps=1e-6)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, 768))
        self.pos_embed = nn.Parameter(torch.zeros(1, 1 + 24 * 24, 768))
        self.pos_drop = nn.Identity()


@pytest.fixture(scope="module")
def ref_dpt_model():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    if REF not in sys.path:
        sys.path.append(REF)
    _stub_module("torchvision.transforms", ["Compose"])
    timm = _stub_module("timm")
    torch.manual_seed(0)
    surrogate = _SurrogateHybridViT()
    with torch.no_grad():
        surrogate.cls_token.normal_(0, 0.3)
        surrogate.pos_embed.normal_(0, 0.3)
    timm.create_model = lambda *a, **k: surrogate
    from DPT.dpt.models import DPTDepthModel
    model = DPTDepthModel(path=None, backbone="vitb_rn50_384",
                          non_negative=True, scale=0.000305, shift=0.1378,
                          invert=True)
    model.eval()
    return model


def _our_params(model):
    from nope_nerf_tpu.models.dpt import convert_torch_state_dict
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return convert_torch_state_dict(sd)


def test_backbone_taps_match_reference(ref_dpt_model):
    """forward_vit over the assembled hybrid graph (hooked stem stages +
    forward_flex with resized pos-embed + act_postprocess) == our
    resnet_stages/vit_forward/readout composition, layer by layer."""
    from DPT.dpt.vit import forward_vit
    from nope_nerf_tpu.models.dpt import (DPTConfig, _readout_project, conv2d,
                                          resnet_stages, vit_forward)

    model = ref_dpt_model
    rng = np.random.RandomState(1)
    x = rng.randn(1, 96, 128, 3).astype(np.float32)
    with torch.no_grad():
        l1t, l2t, l3t, l4t = forward_vit(
            model.pretrained, torch.tensor(np.transpose(x, (0, 3, 1, 2))))

    cfg = DPTConfig()
    params = _our_params(model)
    xj = jnp.asarray(x)
    l1, l2, feat16 = resnet_stages(params, xj, cfg)
    np.testing.assert_allclose(np.asarray(l1),
                               np.transpose(l1t.numpy(), (0, 2, 3, 1)),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(l2),
                               np.transpose(l2t.numpy(), (0, 2, 3, 1)),
                               atol=2e-4)
    t3, t4 = vit_forward(params, feat16, cfg)
    gh, gw = 96 // 16, 128 // 16
    r3 = _readout_project(params, 3, t3).reshape(1, gh, gw, cfg.vit_dim)
    l3 = conv2d(r3, params["pretrained.act_postprocess3.3.weight"],
                params["pretrained.act_postprocess3.3.bias"], 1, "VALID")
    np.testing.assert_allclose(np.asarray(l3),
                               np.transpose(l3t.numpy(), (0, 2, 3, 1)),
                               atol=5e-4)
    r4 = _readout_project(params, 4, t4).reshape(1, gh, gw, cfg.vit_dim)
    l4 = conv2d(r4, params["pretrained.act_postprocess4.3.weight"],
                params["pretrained.act_postprocess4.3.bias"], 1, "VALID")
    l4 = conv2d(l4, params["pretrained.act_postprocess4.4.weight"],
                params["pretrained.act_postprocess4.4.bias"], 2, 1)
    np.testing.assert_allclose(np.asarray(l4),
                               np.transpose(l4t.numpy(), (0, 2, 3, 1)),
                               atol=5e-4)


def test_full_dpt_forward_matches_reference(ref_dpt_model):
    """DPTDepthModel.forward end-to-end (models.py:203-212, incl. the
    scale/shift/invert head) == our dpt_apply on the converted weights."""
    from nope_nerf_tpu.models.dpt import DPTConfig, dpt_apply

    model = ref_dpt_model
    rng = np.random.RandomState(2)
    x = rng.randn(1, 96, 128, 3).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()

    cfg = DPTConfig()  # defaults: scale 0.000305, shift 0.1378, invert=True
    params = _our_params(model)
    got = np.asarray(dpt_apply(params, jnp.asarray(x), cfg))
    assert got.shape == want.shape == (1, 96, 128)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    assert float(np.std(want)) > 1e-6  # the comparison carries real signal
