"""DPT-Hybrid monocular depth estimator in pure JAX.

Capability parity with the reference's frozen DPT depth prior
(`DPT/dpt/models.py:93-212` DPT/DPTDepthModel, `DPT/dpt/vit.py` hybrid backbone,
`DPT/dpt/blocks.py` RefineNet fusion):

- backbone: timm-style `vit_base_resnet50_384` — a ResNetV2 stem (weight-standardized
  'SAME' convs + GroupNorm(32), non-preactivation bottlenecks, stages (3,4,9)) feeding
  a ViT-Base/16 (12 blocks, 12 heads, learned cls token + bilinear-resizable pos
  embeddings, `vit.py:148-202`);
- feature taps: resnet stage 0 (/4, 256ch), stage 1 (/8, 512ch), transformer blocks
  8 and 11 (`vit.py:365-379` hooks), the token maps run through the 'project' readout
  (cls token concat + Linear + GELU) and 1x1/strided convs (`vit.py:243-336`);
- decoder: per-scale 3x3 'scratch' convs to 256ch + 4 FeatureFusionBlock_custom
  stages (2x ResidualConvUnit each, x2 bilinear align_corners upsample, 1x1 out conv)
  + the monocular head (`models.py:170-180`);
- output: inverse depth -> metric-ish depth via 1/(scale*x + shift) clamped at 1e-8
  (`models.py:203-212`).

All params live in a flat dict; `convert_torch_state_dict` maps the public MiDaS
`dpt_hybrid-midas-501f0c75.pt` checkpoint (torch OIHW / (out,in) layouts) into it.
Everything is frozen (stop_gradient at apply) exactly like the reference
(`models.py:137-139`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    features: int = 256
    vit_dim: int = 768
    vit_heads: int = 12
    vit_blocks: int = 12
    mlp_ratio: int = 4
    resnet_layers: Tuple[int, int, int] = (3, 4, 9)
    hooks: Tuple[int, int] = (8, 11)        # transformer taps
    patch_grid: int = 24                    # 384 / 16
    non_negative: bool = True
    scale: float = 0.000305
    shift: float = 0.1378
    invert: bool = True

    @classmethod
    def from_cfg(cls, cfg: dict) -> "DPTConfig":
        d = cfg["depth"]
        return cls(non_negative=d["non_negative"], scale=d["scale"],
                   shift=d["shift"], invert=d["invert"])


# ---------------------------------------------------------------- primitives

def _same_pad(x: jax.Array, kh: int, kw: int, sh: int, sw: int) -> jax.Array:
    """TF-'SAME' asymmetric padding (timm StdConv2dSame / MaxPool2dSame)."""
    h, w = x.shape[1], x.shape[2]
    pad_h = max((math.ceil(h / sh) - 1) * sh + kh - h, 0)
    pad_w = max((math.ceil(w / sw) - 1) * sw + kw - w, 0)
    return jnp.pad(x, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                       (pad_w // 2, pad_w - pad_w // 2), (0, 0)))


def conv2d(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
           stride: int = 1, padding="SAME_TORCH") -> jax.Array:
    """NHWC conv with HWIO weights. padding: int (symmetric torch-style) or
    'SAME_TF' (asymmetric) or 'VALID'."""
    if padding == "SAME_TF":
        x = _same_pad(x, w.shape[0], w.shape[1], stride, stride)
        pad = "VALID"
    elif isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b
    return y


def std_conv(x: jax.Array, w: jax.Array, b: Optional[jax.Array], stride: int,
             padding="SAME_TF", eps: float = 1e-8) -> jax.Array:
    """Weight-standardized conv (timm StdConv2dSame: per-out-channel zero-mean
    unit-var weights)."""
    mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
    w = (w - mean) / jnp.sqrt(var + eps)
    return conv2d(x, w, b, stride, padding)


def group_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               groups: int = 32, eps: float = 1e-5, act: bool = True) -> jax.Array:
    n, h, w, c = x.shape
    xg = x.reshape(n, h, w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) / jnp.sqrt(var + eps)
    out = xg.reshape(n, h, w, c) * gamma + beta
    return jax.nn.relu(out) if act else out


def layer_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               eps: float = 1e-6) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * gamma + beta


def max_pool_same(x: jax.Array, k: int = 3, stride: int = 2) -> jax.Array:
    h, w = x.shape[1], x.shape[2]
    pad_h = max((math.ceil(h / stride) - 1) * stride + k - h, 0)
    pad_w = max((math.ceil(w / stride) - 1) * stride + k - w, 0)
    x = jnp.pad(x, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                    (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
                constant_values=-jnp.inf)  # -inf border: max must ignore padding
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, stride, stride, 1), "VALID")


def resize_bilinear_ac(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize, align_corners=True (torch F.interpolate), NHWC."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size

    def weights(n_out, n_in):
        if n_out == 1 or n_in == 1:
            src = np.zeros(n_out)
        else:
            src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        t = (src - lo).astype(np.float32)
        w = np.zeros((n_out, n_in), np.float32)
        np.add.at(w, (np.arange(n_out), lo), 1 - t)
        np.add.at(w, (np.arange(n_out), hi), t)
        return jnp.asarray(w)

    wh = weights(h_out, h_in)
    ww = weights(w_out, w_in)
    x = jnp.einsum("oh,nhwc->nowc", wh, x)
    x = jnp.einsum("ow,nhwc->nhoc", ww, x)
    return x


def resize_bilinear_nac(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize, align_corners=False (for pos-embed resizing), NHWC."""
    from ..ops.interp import _bilinear_weight
    h_out, w_out = size
    wh = jnp.asarray(_bilinear_weight(h_out, x.shape[1]))
    ww = jnp.asarray(_bilinear_weight(w_out, x.shape[2]))
    x = jnp.einsum("oh,nhwc->nowc", wh, x)
    x = jnp.einsum("ow,nhwc->nhoc", ww, x)
    return x


# ---------------------------------------------------------------- resnetv2

def _bottleneck(params: Params, p: str, x: jax.Array, stride: int,
                has_down: bool) -> jax.Array:
    """Non-preact ResNetV2 bottleneck (timm resnetv2.Bottleneck): conv-gn-relu x2,
    conv-gn, residual add, relu."""
    if has_down:
        sc = std_conv(x, params[f"{p}.downsample.conv.weight"], None, stride)
        sc = group_norm(sc, params[f"{p}.downsample.norm.weight"],
                        params[f"{p}.downsample.norm.bias"], act=False)
    else:
        sc = x
    y = std_conv(x, params[f"{p}.conv1.weight"], None, 1)
    y = group_norm(y, params[f"{p}.norm1.weight"], params[f"{p}.norm1.bias"])
    y = std_conv(y, params[f"{p}.conv2.weight"], None, stride)
    y = group_norm(y, params[f"{p}.norm2.weight"], params[f"{p}.norm2.bias"])
    y = std_conv(y, params[f"{p}.conv3.weight"], None, 1)
    y = group_norm(y, params[f"{p}.norm3.weight"], params[f"{p}.norm3.bias"],
                   act=False)
    return jax.nn.relu(y + sc)


def resnet_stages(params: Params, x: jax.Array, cfg: DPTConfig
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Stem + 3 stages; returns (stage0 /4, stage1 /8, stage2 /16) NHWC features."""
    p = "pretrained.model.patch_embed.backbone"
    x = std_conv(x, params[f"{p}.stem.conv.weight"], None, 2)
    x = group_norm(x, params[f"{p}.stem.norm.weight"], params[f"{p}.stem.norm.bias"])
    x = max_pool_same(x, 3, 2)

    outs = []
    for si, n_blocks in enumerate(cfg.resnet_layers):
        for bi in range(n_blocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            has_down = bi == 0
            x = _bottleneck(params, f"{p}.stages.{si}.blocks.{bi}", x, stride,
                            has_down)
        outs.append(x)
    return outs[0], outs[1], outs[2]


# ---------------------------------------------------------------- vit

def _attention(params: Params, p: str, x: jax.Array, heads: int) -> jax.Array:
    n, d = x.shape[-2], x.shape[-1]
    qkv = x @ params[f"{p}.attn.qkv.weight"] + params[f"{p}.attn.qkv.bias"]
    qkv = qkv.reshape(x.shape[0], n, 3, heads, d // heads)
    q, k, v = jnp.moveaxis(qkv, 2, 0)            # (B, N, H, dh)
    q = jnp.swapaxes(q, 1, 2)                    # (B, H, N, dh)
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)
    scale = 1.0 / math.sqrt(d // heads)
    att = jax.nn.softmax((q @ jnp.swapaxes(k, -1, -2)) * scale, axis=-1)
    y = (att @ v)
    y = jnp.swapaxes(y, 1, 2).reshape(x.shape[0], n, d)
    return y @ params[f"{p}.attn.proj.weight"] + params[f"{p}.attn.proj.bias"]


def _vit_block(params: Params, p: str, x: jax.Array, heads: int) -> jax.Array:
    h = layer_norm(x, params[f"{p}.norm1.weight"], params[f"{p}.norm1.bias"])
    x = x + _attention(params, p, h, heads)
    h = layer_norm(x, params[f"{p}.norm2.weight"], params[f"{p}.norm2.bias"])
    h = jax.nn.gelu(h @ params[f"{p}.mlp.fc1.weight"] + params[f"{p}.mlp.fc1.bias"],
                    approximate=False)
    h = h @ params[f"{p}.mlp.fc2.weight"] + params[f"{p}.mlp.fc2.bias"]
    return x + h


def _resize_pos_embed(pos: jax.Array, gs_h: int, gs_w: int) -> jax.Array:
    """vit.py:148-163: keep cls token, bilinear-resize the grid part."""
    tok, grid = pos[:, :1], pos[0, 1:]
    gs_old = int(math.sqrt(grid.shape[0]))
    grid = grid.reshape(1, gs_old, gs_old, -1)
    grid = resize_bilinear_nac(grid, (gs_h, gs_w))
    return jnp.concatenate([tok, grid.reshape(1, gs_h * gs_w, -1)], axis=1)


def vit_forward(params: Params, feat16: jax.Array, cfg: DPTConfig
                ) -> Tuple[jax.Array, jax.Array]:
    """Hybrid ViT over /16 resnet features; returns (block-hooks[0] tokens,
    block-hooks[1] tokens), each (B, 1+N, D) — WITHOUT the final norm, matching the
    reference's forward hooks (vit.py:365-379)."""
    pm = "pretrained.model"
    b, gh, gw, _ = feat16.shape
    x = conv2d(feat16, params[f"{pm}.patch_embed.proj.weight"],
               params[f"{pm}.patch_embed.proj.bias"], 1, "VALID")
    x = x.reshape(b, gh * gw, cfg.vit_dim)
    cls = jnp.broadcast_to(params[f"{pm}.cls_token"], (b, 1, cfg.vit_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _resize_pos_embed(params[f"{pm}.pos_embed"], gh, gw)

    taps = {}
    for i in range(cfg.vit_blocks):
        x = _vit_block(params, f"{pm}.blocks.{i}", x, cfg.vit_heads)
        if i in cfg.hooks:
            taps[i] = x
    return taps[cfg.hooks[0]], taps[cfg.hooks[1]]


def _readout_project(params: Params, idx: int, tokens: jax.Array) -> jax.Array:
    """'project' readout (vit.py ProjectReadout): spatial tokens concat expanded cls
    -> Linear(2D->D) -> GELU."""
    p = f"pretrained.act_postprocess{idx}.0.project.0"
    spatial = tokens[:, 1:]
    cls = jnp.broadcast_to(tokens[:, :1], spatial.shape)
    feats = jnp.concatenate([spatial, cls], axis=-1)
    y = feats @ params[f"{p}.weight"] + params[f"{p}.bias"]
    return jax.nn.gelu(y, approximate=False)


# ---------------------------------------------------------------- decoder

def _rcu(params: Params, p: str, x: jax.Array) -> jax.Array:
    """ResidualConvUnit_custom, bn=False (blocks.py:247-300)."""
    y = jax.nn.relu(x)
    y = conv2d(y, params[f"{p}.conv1.weight"], params[f"{p}.conv1.bias"], 1, 1)
    y = jax.nn.relu(y)
    y = conv2d(y, params[f"{p}.conv2.weight"], params[f"{p}.conv2.bias"], 1, 1)
    return y + x


def _fusion(params: Params, p: str, x: jax.Array,
            skip: Optional[jax.Array]) -> jax.Array:
    """FeatureFusionBlock_custom (blocks.py:318-383): optional skip through RCU1,
    RCU2, x2 bilinear align_corners upsample, 1x1 out conv."""
    if skip is not None:
        x = x + _rcu(params, f"{p}.resConfUnit1", skip)
    x = _rcu(params, f"{p}.resConfUnit2", x)
    x = resize_bilinear_ac(x, (x.shape[1] * 2, x.shape[2] * 2))
    return conv2d(x, params[f"{p}.out_conv.weight"], params[f"{p}.out_conv.bias"],
                  1, 0)


def dpt_apply(params: Params, img: jax.Array, cfg: DPTConfig) -> jax.Array:
    """(B, H, W, 3) normalized image -> (B, H, W) depth (or inverse depth).

    H, W must be multiples of 32 (the DPT input transform guarantees this).
    """
    params = jax.lax.stop_gradient(params)  # frozen (models.py:137-139)
    b, h, w, _ = img.shape

    l1, l2, feat16 = resnet_stages(params, img, cfg)          # /4, /8, /16
    t3, t4 = vit_forward(params, feat16, cfg)
    gh, gw = h // 16, w // 16

    r3 = _readout_project(params, 3, t3).reshape(b, gh, gw, cfg.vit_dim)
    l3 = conv2d(r3, params["pretrained.act_postprocess3.3.weight"],
                params["pretrained.act_postprocess3.3.bias"], 1, "VALID")
    r4 = _readout_project(params, 4, t4).reshape(b, gh, gw, cfg.vit_dim)
    l4 = conv2d(r4, params["pretrained.act_postprocess4.3.weight"],
                params["pretrained.act_postprocess4.3.bias"], 1, "VALID")
    l4 = conv2d(l4, params["pretrained.act_postprocess4.4.weight"],
                params["pretrained.act_postprocess4.4.bias"], 2, 1)  # /32

    rn = [conv2d(l, params[f"scratch.layer{i}_rn.weight"], None, 1, 1)
          for i, l in ((1, l1), (2, l2), (3, l3), (4, l4))]

    path4 = _fusion(params, "scratch.refinenet4", rn[3], None)
    path3 = _fusion(params, "scratch.refinenet3", path4, rn[2])
    path2 = _fusion(params, "scratch.refinenet2", path3, rn[1])
    path1 = _fusion(params, "scratch.refinenet1", path2, rn[0])

    # head (models.py:170-180)
    y = conv2d(path1, params["scratch.output_conv.0.weight"],
               params["scratch.output_conv.0.bias"], 1, 1)
    y = resize_bilinear_ac(y, (y.shape[1] * 2, y.shape[2] * 2))
    y = conv2d(y, params["scratch.output_conv.2.weight"],
               params["scratch.output_conv.2.bias"], 1, 1)
    y = jax.nn.relu(y)
    y = conv2d(y, params["scratch.output_conv.4.weight"],
               params["scratch.output_conv.4.bias"], 1, 0)
    if cfg.non_negative:
        y = jax.nn.relu(y)
    inv_depth = y[..., 0]

    if cfg.invert:  # models.py:203-212
        depth = cfg.scale * inv_depth + cfg.shift
        depth = jnp.maximum(depth, 1e-8)
        return 1.0 / depth
    return inv_depth


# ---------------------------------------------------------------- conversion

def convert_torch_state_dict(sd: Dict[str, np.ndarray]) -> Params:
    """Map the MiDaS dpt_hybrid torch checkpoint into the flat JAX params dict.

    torch conv weights OIHW -> HWIO; linear (out,in) -> (in,out). Keys keep the
    torch names so dpt_apply can address them directly.
    """
    out: Params = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k.endswith(".weight") and v.ndim == 4:            # conv
            out[k] = jnp.asarray(np.transpose(v, (2, 3, 1, 0)))
        elif (k.endswith(".weight") and v.ndim == 2):        # linear
            out[k] = jnp.asarray(v.T)
        else:
            out[k] = jnp.asarray(v)
    return out


def load_dpt(path: str, cfg: Optional[DPTConfig] = None) -> Tuple[Params, DPTConfig]:
    """Load a DPT checkpoint: either a converted .npz of jax params or a torch .pt
    state dict (requires torch importable)."""
    cfg = cfg or DPTConfig()
    if path.endswith(".npz"):
        data = np.load(path)
        return {k: jnp.asarray(data[k]) for k in data.files}, cfg
    import torch
    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_torch_state_dict(sd), cfg


# ---------------------------------------------------------------- random init

def init_dpt_params(key: jax.Array, cfg: Optional[DPTConfig] = None) -> Params:
    """Random-weight DPT (for tests / smoke runs without the 470MB checkpoint)."""
    cfg = cfg or DPTConfig()
    rng = np.random.RandomState(0)
    p: Dict[str, np.ndarray] = {}

    def conv(name, kh, kw, cin, cout, bias=True):
        p[name + ".weight"] = rng.randn(kh, kw, cin, cout).astype(np.float32) * 0.02
        if bias:
            p[name + ".bias"] = np.zeros(cout, np.float32)

    def norm(name, c):
        p[name + ".weight"] = np.ones(c, np.float32)
        p[name + ".bias"] = np.zeros(c, np.float32)

    def linear(name, cin, cout):
        p[name + ".weight"] = rng.randn(cin, cout).astype(np.float32) * 0.02
        p[name + ".bias"] = np.zeros(cout, np.float32)

    bb = "pretrained.model.patch_embed.backbone"
    conv(f"{bb}.stem.conv", 7, 7, 3, 64, bias=False)
    norm(f"{bb}.stem.norm", 64)
    chans = [(64, 256), (256, 512), (512, 1024)]
    for si, n_blocks in enumerate(cfg.resnet_layers):
        cin, cout = chans[si]
        mid = cout // 4
        for bi in range(n_blocks):
            pre = f"{bb}.stages.{si}.blocks.{bi}"
            cin_b = cin if bi == 0 else cout
            if bi == 0:
                conv(f"{pre}.downsample.conv", 1, 1, cin_b, cout, bias=False)
                norm(f"{pre}.downsample.norm", cout)
            conv(f"{pre}.conv1", 1, 1, cin_b, mid, bias=False)
            norm(f"{pre}.norm1", mid)
            conv(f"{pre}.conv2", 3, 3, mid, mid, bias=False)
            norm(f"{pre}.norm2", mid)
            conv(f"{pre}.conv3", 1, 1, mid, cout, bias=False)
            norm(f"{pre}.norm3", cout)

    pm = "pretrained.model"
    conv(f"{pm}.patch_embed.proj", 1, 1, 1024, cfg.vit_dim)
    p[f"{pm}.cls_token"] = np.zeros((1, 1, cfg.vit_dim), np.float32)
    p[f"{pm}.pos_embed"] = (rng.randn(1, cfg.patch_grid ** 2 + 1, cfg.vit_dim)
                            .astype(np.float32) * 0.02)
    for i in range(cfg.vit_blocks):
        pre = f"{pm}.blocks.{i}"
        norm(f"{pre}.norm1", cfg.vit_dim)
        linear(f"{pre}.attn.qkv", cfg.vit_dim, 3 * cfg.vit_dim)
        linear(f"{pre}.attn.proj", cfg.vit_dim, cfg.vit_dim)
        norm(f"{pre}.norm2", cfg.vit_dim)
        linear(f"{pre}.mlp.fc1", cfg.vit_dim, cfg.mlp_ratio * cfg.vit_dim)
        linear(f"{pre}.mlp.fc2", cfg.mlp_ratio * cfg.vit_dim, cfg.vit_dim)

    for idx in (3, 4):
        linear(f"pretrained.act_postprocess{idx}.0.project.0",
               2 * cfg.vit_dim, cfg.vit_dim)
    conv("pretrained.act_postprocess3.3", 1, 1, cfg.vit_dim, cfg.vit_dim)
    conv("pretrained.act_postprocess4.3", 1, 1, cfg.vit_dim, cfg.vit_dim)
    conv("pretrained.act_postprocess4.4", 3, 3, cfg.vit_dim, cfg.vit_dim)

    f = cfg.features
    for i, cin in ((1, 256), (2, 512), (3, cfg.vit_dim), (4, cfg.vit_dim)):
        conv(f"scratch.layer{i}_rn", 3, 3, cin, f, bias=False)
    for i in (1, 2, 3, 4):
        pre = f"scratch.refinenet{i}"
        conv(f"{pre}.out_conv", 1, 1, f, f)
        for r in (1, 2):
            conv(f"{pre}.resConfUnit{r}.conv1", 3, 3, f, f)
            conv(f"{pre}.resConfUnit{r}.conv2", 3, 3, f, f)
    conv("scratch.output_conv.0", 3, 3, f, f // 2)
    conv("scratch.output_conv.2", 3, 3, f // 2, 32)
    conv("scratch.output_conv.4", 1, 1, 32, 1)

    return {k: jnp.asarray(v) for k, v in p.items()}
