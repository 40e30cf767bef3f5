"""DPT-Hybrid tests: primitive parity vs torch, architecture shape flow, transform
sizing, state-dict conversion, and the preprocess pipeline."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from nope_nerf_tpu.models.dpt import (
    DPTConfig, dpt_apply, init_dpt_params, convert_torch_state_dict,
    conv2d, std_conv, group_norm, layer_norm, max_pool_same,
    resize_bilinear_ac, _resize_pos_embed, _attention,
)
from nope_nerf_tpu.data.dpt_transforms import dpt_target_size, prepare_dpt_input


def test_conv2d_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 9, 11, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 6).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1, 1))
    tw = torch.from_numpy(w).permute(3, 2, 0, 1)
    want = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), tw,
                    torch.from_numpy(b), padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_std_conv_same_matches_torch():
    """timm StdConv2dSame = weight standardization + TF SAME padding."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 15, 15, 3).astype(np.float32)
    w = rng.randn(7, 7, 3, 8).astype(np.float32)
    got = np.asarray(std_conv(jnp.asarray(x), jnp.asarray(w), None, 2))

    tw = torch.from_numpy(w).permute(3, 2, 0, 1)
    tw = (tw - tw.mean(dim=[1, 2, 3], keepdim=True)) / torch.sqrt(
        tw.var(dim=[1, 2, 3], unbiased=False, keepdim=True) + 1e-8)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    # TF SAME for k=7 s=2 on 15: out=8, pad_total=6 -> (3,3)
    tx = F.pad(tx, (3, 3, 3, 3))
    want = F.conv2d(tx, tw, stride=2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_group_norm_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 7, 64).astype(np.float32)
    g = rng.rand(64).astype(np.float32)
    b = rng.randn(64).astype(np.float32)
    got = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
                                groups=32, act=False))
    want = F.group_norm(torch.from_numpy(x).permute(0, 3, 1, 2), 32,
                        torch.from_numpy(g), torch.from_numpy(b)
                        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_layer_norm_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 10, 768).astype(np.float32)
    g = rng.rand(768).astype(np.float32)
    b = rng.randn(768).astype(np.float32)
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b)))
    want = F.layer_norm(torch.from_numpy(x), (768,), torch.from_numpy(g),
                        torch.from_numpy(b), eps=1e-6).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_maxpool_same_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(1, 13, 13, 2).astype(np.float32)
    got = np.asarray(max_pool_same(jnp.asarray(x), 3, 2))
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    # TF SAME k3 s2 on 13: out=7, pad_total=(7-1)*2+3-13=2 -> (1,1)
    tx = F.pad(tx, (1, 1, 1, 1), value=float("-inf"))
    want = F.max_pool2d(tx, 3, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_bilinear_ac_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(1, 6, 8, 3).astype(np.float32)
    got = np.asarray(resize_bilinear_ac(jnp.asarray(x), (12, 16)))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), (12, 16),
                         mode="bilinear", align_corners=True
                         ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_matches_torch():
    """timm ViT attention block vs ours."""
    rng = np.random.RandomState(6)
    d, heads, n = 64, 4, 10
    x = rng.randn(1, n, d).astype(np.float32)
    wqkv = rng.randn(d, 3 * d).astype(np.float32) * 0.1
    bqkv = rng.randn(3 * d).astype(np.float32) * 0.1
    wproj = rng.randn(d, d).astype(np.float32) * 0.1
    bproj = rng.randn(d).astype(np.float32) * 0.1
    params = {"blk.attn.qkv.weight": jnp.asarray(wqkv),
              "blk.attn.qkv.bias": jnp.asarray(bqkv),
              "blk.attn.proj.weight": jnp.asarray(wproj),
              "blk.attn.proj.bias": jnp.asarray(bproj)}
    got = np.asarray(_attention(params, "blk", jnp.asarray(x), heads))

    tx = torch.from_numpy(x)
    qkv = (tx @ torch.from_numpy(wqkv) + torch.from_numpy(bqkv))
    qkv = qkv.reshape(1, n, 3, heads, d // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    att = torch.softmax((q @ k.transpose(-2, -1)) / np.sqrt(d // heads), dim=-1)
    y = (att @ v).transpose(1, 2).reshape(1, n, d)
    want = (y @ torch.from_numpy(wproj) + torch.from_numpy(bproj)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_resize_pos_embed():
    pos = jnp.asarray(np.random.RandomState(7).randn(1, 24 * 24 + 1, 16), jnp.float32)
    out = _resize_pos_embed(pos, 12, 18)
    assert out.shape == (1, 12 * 18 + 1, 16)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(pos[:, 0]))


@pytest.fixture(scope="module")
def dpt_small():
    """A shrunken DPT (2 ViT blocks, 1-1-1 resnet stages, 32 features) for shape
    tests — same code path, ~1000x fewer FLOPs."""
    cfg = DPTConfig(features=32, vit_dim=64, vit_heads=4, vit_blocks=2,
                    resnet_layers=(1, 1, 1), hooks=(0, 1), patch_grid=4)
    params = init_dpt_params(jax.random.key(0), cfg)
    return cfg, params


def test_dpt_shape_flow(dpt_small):
    cfg, params = dpt_small
    img = jnp.asarray(np.random.RandomState(8).randn(1, 64, 96, 3), jnp.float32)
    out = dpt_apply(params, img, cfg)
    assert out.shape == (1, 64, 96)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.asarray(out) > 0)  # inverted + clamped -> positive depth


def test_dpt_full_size_init():
    """The full-size random init has the exact parameter set the MiDaS checkpoint
    provides (keys and shapes) — conversion contract."""
    params = init_dpt_params(jax.random.key(0))
    n_params = sum(int(np.prod(p.shape)) for p in params.values())
    assert 110e6 < n_params < 130e6  # DPT-hybrid is ~123M params
    # spot-check key names match torch checkpoint naming
    for k in ["pretrained.model.patch_embed.backbone.stem.conv.weight",
              "pretrained.model.blocks.11.mlp.fc2.weight",
              "pretrained.act_postprocess4.4.weight",
              "scratch.refinenet1.resConfUnit2.conv2.bias",
              "scratch.output_conv.4.weight"]:
        assert k in params, k


def test_convert_torch_state_dict():
    sd = {"a.weight": np.ones((8, 4, 3, 3), np.float32),      # conv OIHW
          "b.weight": np.ones((16, 8), np.float32),           # linear
          "c.bias": np.ones(8, np.float32)}
    out = convert_torch_state_dict(sd)
    assert out["a.weight"].shape == (3, 3, 4, 8)
    assert out["b.weight"].shape == (8, 16)
    assert out["c.bias"].shape == (8,)


def test_dpt_target_size():
    assert dpt_target_size(188, 621) == (384, 1280)  # V-KITTI aspect
    assert dpt_target_size(384, 384) == (384, 384)
    h, w = dpt_target_size(480, 640)
    assert h >= 384 and w >= 384 and h % 32 == 0 and w % 32 == 0


def test_prepare_dpt_input():
    img = np.random.RandomState(9).rand(100, 150, 3).astype(np.float32)
    out = prepare_dpt_input(img)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    # INTER_CUBIC overshoots the [0,1] input range slightly (reference doesn't clamp)
    assert out.min() >= -1.6 and out.max() <= 1.6
    assert abs(out.mean()) < 0.3


def test_preprocess_cli_random_weights(tmp_path):
    """End-to-end preprocess with random DPT weights on a tiny synthetic scene."""
    from nope_nerf_tpu.cli.preprocess import preprocess
    from nope_nerf_tpu.config import load_config
    from nope_nerf_tpu.data import SceneData, make_synthetic_scene

    scene = SceneData.from_dict(dict(make_synthetic_scene(n_frames=2, h=32, w=48)))
    cfg = load_config(overrides={"dataloading": {"path": str(tmp_path)}})
    # shrink the model via monkeypatched config? instead: small scene + full model
    # would be slow on CPU — use the tiny architecture by patching DPTConfig.from_cfg
    import nope_nerf_tpu.cli.preprocess as pp
    import nope_nerf_tpu.models.dpt as dptmod
    orig = dptmod.DPTConfig.from_cfg
    try:
        dptmod.DPTConfig.from_cfg = classmethod(
            lambda cls, c: dptmod.DPTConfig(features=32, vit_dim=64, vit_heads=4,
                                            vit_blocks=2, resnet_layers=(1, 1, 1),
                                            hooks=(0, 1), patch_grid=4))
        out_dir = preprocess(cfg, random_weights=True, scene=scene)
    finally:
        dptmod.DPTConfig.from_cfg = orig
    files = os.listdir(out_dir)
    assert "depth_0000.npz" in files and "depth_0001.npz" in files
    d = np.load(os.path.join(out_dir, "depth_0000.npz"))["pred"]
    assert d.ndim == 2 and np.isfinite(d).all()


def test_convert_full_inventory_roundtrip_and_coverage(monkeypatch):
    """De-risk real-checkpoint conversion (no MiDaS file ships in this image):
    synthesize a torch-layout state dict with the full dpt_hybrid key inventory
    (module tree per /root/reference/DPT/dpt/vit.py:501 + models.py:93-212,
    plus the final ViT LayerNorm the real checkpoint carries but inference
    never reads), round-trip it through convert_torch_state_dict, and assert
    the forward touches EXACTLY the converted keys — any missing, misshapen,
    or silently-dropped parameter mapping fails here."""
    cfg = DPTConfig()
    ref = init_dpt_params(jax.random.key(0), cfg)

    # JAX layout -> torch layout (conv HWIO->OIHW, linear (in,out)->(out,in))
    sd = {}
    for k, v in ref.items():
        v = np.asarray(v)
        if k.endswith(".weight") and v.ndim == 4:
            sd[k] = np.transpose(v, (3, 2, 0, 1))
        elif k.endswith(".weight") and v.ndim == 2:
            sd[k] = v.T
        else:
            sd[k] = v
    unused = {  # present in the real file, unread by DPT inference
        "pretrained.model.norm.weight": np.ones(cfg.vit_dim, np.float32),
        "pretrained.model.norm.bias": np.zeros(cfg.vit_dim, np.float32),
    }
    sd.update(unused)

    converted = convert_torch_state_dict(sd)
    assert set(converted) == set(ref) | set(unused)
    for k, v in ref.items():  # layout round-trip must be exact
        np.testing.assert_array_equal(np.asarray(converted[k]), np.asarray(v))

    class Tracking(dict):
        touched: set = set()

        def __getitem__(self, k):
            Tracking.touched.add(k)
            return super().__getitem__(k)

    # stop_gradient would rebuild the dict and drop the subclass; value-
    # equivalent passthrough for the tracked forward
    monkeypatch.setattr(jax.lax, "stop_gradient", lambda x: x)
    Tracking.touched = set()
    img = jnp.linspace(-1, 1, 1 * 96 * 128 * 3).reshape(1, 96, 128, 3)
    out = dpt_apply(Tracking(converted), img.astype(jnp.float32), cfg)
    assert out.shape[0] == 1 and np.isfinite(np.asarray(out)).all()

    # refinenet4 gets no skip input (models.py:155-158), so its resConfUnit1
    # is dead weight in the reference too (blocks.py:110-115 applies it only
    # when a second input exists) — the real checkpoint still carries it
    ref_unused = {k for k in ref
                  if k.startswith("scratch.refinenet4.resConfUnit1.")}
    missing = set(ref) - Tracking.touched - ref_unused
    assert not missing, f"params never consumed: {sorted(missing)[:8]}"
    extra = Tracking.touched - set(converted)
    assert not extra, f"forward read unmapped keys: {sorted(extra)[:8]}"
    # and the ONLY unconsumed checkpoint keys are the documented unused sets
    assert set(converted) - Tracking.touched == set(unused) | ref_unused
