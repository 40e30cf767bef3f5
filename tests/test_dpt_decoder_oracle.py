"""DPT decoder oracle vs the ACTUAL reference modules (VERDICT round-2 item 6).

`DPT/dpt/blocks.py` (ResidualConvUnit_custom, FeatureFusionBlock_custom,
Interpolate, _make_scratch) and the act_postprocess / readout machinery of
`DPT/dpt/vit.py:104-204` import WITHOUT timm — only the `_make_pretrained_*`
constructors touch it. These tests instantiate those real torch modules with
random weights, feed injected backbone features/tokens, convert the weights
through `convert_torch_state_dict` (so the converter's decoder mapping is on
trial too), and assert our `models/dpt.py` decoder functions match
layer-by-layer. After this, the only untested DPT surface is the timm ViT
backbone itself (absent from this image).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_reference_oracle import _stub_module

REF = "/root/reference"

pytestmark = pytest.mark.oracle


@pytest.fixture(scope="module")
def refdpt():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    if REF not in sys.path:
        sys.path.append(REF)
    _stub_module("timm")
    _stub_module("torchvision.transforms", ["Compose"])
    from DPT.dpt import blocks as ref_blocks
    from DPT.dpt import vit as ref_vit
    return types.SimpleNamespace(blocks=ref_blocks, vit=ref_vit)


def _convert(module, prefix):
    """torch module -> our flat jax params (through the real converter)."""
    from nope_nerf_tpu.models.dpt import convert_torch_state_dict
    sd = {f"{prefix}.{k}": v.detach().numpy()
          for k, v in module.state_dict().items()}
    return convert_torch_state_dict(sd)


def _nchw(x_nhwc):
    return torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_residual_conv_unit_matches_reference(refdpt):
    """ResidualConvUnit_custom (bn=False, ReLU) == our _rcu (blocks.py:247-313)."""
    from nope_nerf_tpu.models.dpt import _rcu

    torch.manual_seed(0)
    C = 16
    mod = refdpt.blocks.ResidualConvUnit_custom(C, torch.nn.ReLU(False), bn=False)
    params = _convert(mod, "scratch.refinenet1.resConfUnit1")
    x = np.random.RandomState(1).randn(1, 10, 14, C).astype(np.float32)
    want = _to_nhwc(mod(_nchw(x)))
    got = np.asarray(_rcu(params, "scratch.refinenet1.resConfUnit1",
                          jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("with_skip", [False, True])
def test_feature_fusion_block_matches_reference(refdpt, with_skip):
    """FeatureFusionBlock_custom (deconv=False, bn=False, expand=False,
    align_corners=True — exactly models.py:20-27's _make_fusion_block) == our
    _fusion (blocks.py:318-383)."""
    from nope_nerf_tpu.models.dpt import _fusion

    torch.manual_seed(2)
    C = 16
    mod = refdpt.blocks.FeatureFusionBlock_custom(
        C, torch.nn.ReLU(False), deconv=False, bn=False, expand=False,
        align_corners=True)
    params = _convert(mod, "scratch.refinenet3")
    rng = np.random.RandomState(3)
    x = rng.randn(1, 6, 9, C).astype(np.float32)
    skip = rng.randn(1, 6, 9, C).astype(np.float32)

    if with_skip:
        want = _to_nhwc(mod(_nchw(x), _nchw(skip)))
        got = _fusion(params, "scratch.refinenet3", jnp.asarray(x),
                      jnp.asarray(skip))
    else:
        want = _to_nhwc(mod(_nchw(x)))
        got = _fusion(params, "scratch.refinenet3", jnp.asarray(x), None)
    assert got.shape == want.shape  # x2 upsample happened
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_scratch_rn_convs_match_reference(refdpt):
    """_make_scratch's 3x3 stride-1 pad-1 no-bias convs (blocks.py:67-120) ==
    our rn conv calls in dpt_apply."""
    from nope_nerf_tpu.models.dpt import conv2d

    torch.manual_seed(4)
    scratch = refdpt.blocks._make_scratch([8, 16, 24, 24], 32)
    params = _convert(scratch, "scratch")
    rng = np.random.RandomState(5)
    for i, cin in ((1, 8), (2, 16), (3, 24), (4, 24)):
        x = rng.randn(1, 7, 11, cin).astype(np.float32)
        want = _to_nhwc(getattr(scratch, f"layer{i}_rn")(_nchw(x)))
        got = conv2d(jnp.asarray(x), params[f"scratch.layer{i}_rn.weight"],
                     None, 1, 1)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_interpolate_matches_reference(refdpt):
    """Interpolate(scale_factor=2, bilinear, ac=True) — the head's upsample
    (models.py:172) == our resize_bilinear_ac."""
    from nope_nerf_tpu.models.dpt import resize_bilinear_ac

    mod = refdpt.blocks.Interpolate(scale_factor=2, mode="bilinear",
                                    align_corners=True)
    x = np.random.RandomState(6).randn(1, 5, 8, 3).astype(np.float32)
    want = _to_nhwc(mod(_nchw(x)))
    got = resize_bilinear_ac(jnp.asarray(x), (10, 16))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_resize_pos_embed_matches_reference(refdpt):
    """The injected _resize_pos_embed (vit.py:148-163) == ours: cls token kept,
    grid part bilinear-resized WITHOUT align_corners."""
    from nope_nerf_tpu.models.dpt import _resize_pos_embed

    rng = np.random.RandomState(7)
    posemb = rng.randn(1, 1 + 24 * 24, 12).astype(np.float32)
    stub = types.SimpleNamespace(start_index=1)
    want = refdpt.vit._resize_pos_embed(stub, torch.tensor(posemb), 7, 13)
    got = _resize_pos_embed(jnp.asarray(posemb), 7, 13)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_act_postprocess_project_readout_matches_reference(refdpt):
    """The full act_postprocess3/4 token->feature pipelines (ProjectReadout ->
    Transpose -> Unflatten -> 1x1 conv [-> 3x3 s2 conv]), applied in the
    reference's own two-phase forward_vit order (vit.py:114-143), vs our
    _readout_project + conv chain in dpt_apply."""
    from nope_nerf_tpu.models.dpt import _readout_project, conv2d

    torch.manual_seed(8)
    vit_features, feat3, feat4 = 24, 20, 28
    gh, gw = 6, 8
    v = refdpt.vit
    act3 = torch.nn.Sequential(
        v.ProjectReadout(vit_features, 1), v.Transpose(1, 2),
        torch.nn.Unflatten(2, torch.Size([gh, gw])),
        torch.nn.Conv2d(vit_features, feat3, kernel_size=1))
    act4 = torch.nn.Sequential(
        v.ProjectReadout(vit_features, 1), v.Transpose(1, 2),
        torch.nn.Unflatten(2, torch.Size([gh, gw])),
        torch.nn.Conv2d(vit_features, feat4, kernel_size=1),
        torch.nn.Conv2d(feat4, feat4, kernel_size=3, stride=2, padding=1))

    params = {}
    params.update(_convert(act3, "pretrained.act_postprocess3"))
    params.update(_convert(act4, "pretrained.act_postprocess4"))

    tokens = np.random.RandomState(9).randn(1, 1 + gh * gw,
                                            vit_features).astype(np.float32)
    t = torch.tensor(tokens)

    # reference application order: [0:2], unflatten at known grid, [3:]
    def ref_apply(act):
        y = act[0:2](t)
        y = torch.nn.Unflatten(2, torch.Size([gh, gw]))(y)
        return _to_nhwc(act[3:len(act)](y))

    want3, want4 = ref_apply(act3), ref_apply(act4)

    r3 = _readout_project(params, 3, jnp.asarray(tokens)).reshape(
        1, gh, gw, vit_features)
    got3 = conv2d(r3, params["pretrained.act_postprocess3.3.weight"],
                  params["pretrained.act_postprocess3.3.bias"], 1, "VALID")
    r4 = _readout_project(params, 4, jnp.asarray(tokens)).reshape(
        1, gh, gw, vit_features)
    got4 = conv2d(r4, params["pretrained.act_postprocess4.3.weight"],
                  params["pretrained.act_postprocess4.3.bias"], 1, "VALID")
    got4 = conv2d(got4, params["pretrained.act_postprocess4.4.weight"],
                  params["pretrained.act_postprocess4.4.bias"], 2, 1)

    np.testing.assert_allclose(np.asarray(got3), want3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got4), want4, atol=1e-5)


def test_output_head_matches_reference(refdpt):
    """The monodepth head (models.py:170-180: conv3x3 -> Interpolate x2 ac=True
    -> conv3x3 -> ReLU -> conv1x1 -> ReLU) vs dpt_apply's tail. The Sequential
    is built here from blocks.Interpolate + plain convs exactly as
    DPTDepthModel.__init__ does (it is not constructible without timm)."""
    from nope_nerf_tpu.models.dpt import conv2d, resize_bilinear_ac

    torch.manual_seed(10)
    features = 16
    head = torch.nn.Sequential(
        torch.nn.Conv2d(features, features // 2, kernel_size=3, stride=1,
                        padding=1),
        refdpt.blocks.Interpolate(scale_factor=2, mode="bilinear",
                                  align_corners=True),
        torch.nn.Conv2d(features // 2, 32, kernel_size=3, stride=1, padding=1),
        torch.nn.ReLU(True),
        torch.nn.Conv2d(32, 1, kernel_size=1, stride=1, padding=0),
        torch.nn.ReLU(True),
    )
    params = _convert(head, "scratch.output_conv")
    x = np.random.RandomState(11).randn(1, 6, 9, features).astype(np.float32)
    want = _to_nhwc(head(_nchw(x)))

    y = conv2d(jnp.asarray(x), params["scratch.output_conv.0.weight"],
               params["scratch.output_conv.0.bias"], 1, 1)
    y = resize_bilinear_ac(y, (y.shape[1] * 2, y.shape[2] * 2))
    y = conv2d(y, params["scratch.output_conv.2.weight"],
               params["scratch.output_conv.2.bias"], 1, 1)
    y = jax.nn.relu(y)
    y = conv2d(y, params["scratch.output_conv.4.weight"],
               params["scratch.output_conv.4.bias"], 1, 0)
    y = jax.nn.relu(y)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)
