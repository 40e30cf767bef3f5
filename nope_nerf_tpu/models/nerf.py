"""The "official" NeRF MLP as a pure function over a params pytree.

Capability parity with `model/official_nerf.py:8-119` (OfficialStaticNerf):
- frequency encoding with identity concat: levels 10 (position, 63-dim) / 4 (dir, 27-dim);
- trunk of 4+4 Linear(256) layers with a skip concat of the position encoding;
- density head (bias init 0.1) with softplus/relu activation, optional 1-exp(-sigma)
  occupancy transform when dist_alpha=False (`official_nerf.py:77-83`);
- feature + direction-encoding -> 128 -> sigmoid RGB head (bias 0.02, or 0.8 on white bg).

TPU-first design: params are a flat dict of (in,out) weight matrices; apply runs on
(M, C) point batches so every layer is one MXU matmul. No nn.Module state, no Python
chunk loop — chunking (reference `rendering.py:102-111`) is unnecessary under XLA
because the whole render fits HBM and fuses; for full-image eval the caller lax.maps
over fixed-size ray tiles instead.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class NerfConfig:
    hidden_dim: int = 256
    pos_enc_levels: int = 10
    dir_enc_levels: int = 4
    occ_activation: str = "softplus"  # 'softplus' | 'relu'
    dist_alpha: bool = False          # False => density -> 1-exp(-density) occupancy
    white_background: bool = False
    # Matmul precision: 'bfloat16' runs the 9 Linears on the MXU at ~4x fp32
    # throughput (params stay fp32 masters; accumulation is fp32 via
    # preferred_element_type; encodings/activations/heads stay fp32).
    # 'float32' is bit-faithful to the reference for parity tests.
    compute_dtype: str = "bfloat16"
    # Route point queries through the fused Pallas kernel (ops/pallas_mlp.py).
    # Requires hidden_dim % 128 == 0 and the reference 10/4 encoding levels;
    # the renderer dispatches on this flag.
    use_pallas: bool = False

    @property
    def pos_in_dims(self) -> int:
        return (2 * self.pos_enc_levels + 1) * 3

    @property
    def dir_in_dims(self) -> int:
        return (2 * self.dir_enc_levels + 1) * 3

    @classmethod
    def from_cfg(cls, cfg: dict) -> "NerfConfig":
        return cls(
            hidden_dim=cfg["model"]["hidden_dim"],
            pos_enc_levels=cfg["model"]["pos_enc_levels"],
            dir_enc_levels=cfg["model"]["dir_enc_levels"],
            occ_activation=cfg["model"]["occ_activation"],
            dist_alpha=cfg["rendering"]["dist_alpha"],
            white_background=cfg["rendering"]["white_background"],
            compute_dtype=cfg.get("tpu", {}).get("compute_dtype", "bfloat16"),
            use_pallas=bool(
                cfg.get("tpu", {}).get("use_pallas_renderer", False)
                and cfg["model"]["hidden_dim"] % 128 == 0
                and cfg["model"]["pos_enc_levels"] == 10
                and cfg["model"]["dir_enc_levels"] == 4),
        )


def encode_position(x: jax.Array, levels: int, inc_input: bool = True) -> jax.Array:
    """Log-sampled sin/cos frequency encoding, identity-first concat.

    Output feature order matches the reference exactly (`official_nerf.py:99-119`):
    [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{L-1} x), cos(2^{L-1} x)] along the last axis.
    """
    feats = [x] if inc_input else []
    for i in range(levels):
        scaled = (2.0 ** i) * x
        feats.append(jnp.sin(scaled))
        feats.append(jnp.cos(scaled))
    return jnp.concatenate(feats, axis=-1)


def _linear_init(key: jax.Array, fan_in: int, fan_out: int,
                 dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both W and b — the same distribution
    torch.nn.Linear uses, so statistically-matched inits for loss-curve parity."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return w, b


def init_nerf_params(key: jax.Array, cfg: NerfConfig, dtype=jnp.float32) -> Params:
    D = cfg.hidden_dim
    pos_in, dir_in = cfg.pos_in_dims, cfg.dir_in_dims
    keys = iter(jax.random.split(key, 16))
    params: Params = {}

    dims0 = [pos_in, D, D, D, D]
    for i in range(4):
        w, b = _linear_init(next(keys), dims0[i], dims0[i + 1], dtype)
        params[f"trunk0_{i}_w"], params[f"trunk0_{i}_b"] = w, b
    dims1 = [D + pos_in, D, D, D, D]
    for i in range(4):
        w, b = _linear_init(next(keys), dims1[i], dims1[i + 1], dtype)
        params[f"trunk1_{i}_w"], params[f"trunk1_{i}_b"] = w, b

    w, b = _linear_init(next(keys), D, 1, dtype)
    params["density_w"] = w
    params["density_b"] = jnp.full((1,), 0.1, dtype)  # official_nerf.py:39

    w, b = _linear_init(next(keys), D, D, dtype)
    params["feature_w"], params["feature_b"] = w, b

    w, b = _linear_init(next(keys), D + dir_in, D // 2, dtype)
    params["rgb_hidden_w"], params["rgb_hidden_b"] = w, b

    w, b = _linear_init(next(keys), D // 2, 3, dtype)
    params["rgb_w"] = w
    rgb_bias = 0.8 if cfg.white_background else 0.02  # official_nerf.py:41-44
    params["rgb_b"] = jnp.full((3,), rgb_bias, dtype)
    return params


def reset_linear_params(key: jax.Array, params: Params, cfg: NerfConfig) -> Params:
    """Re-initialize every linear layer (the reference's scheduling_mode='reset'
    re-init at decay start, `train.py:347-350` — torch reset_parameters includes the
    head biases, so the custom density/rgb biases revert to uniform too)."""
    fresh = init_nerf_params(key, cfg, dtype=params["density_w"].dtype)
    kd, kr = jax.random.split(jax.random.fold_in(key, 1))
    bound_d = 1.0 / math.sqrt(cfg.hidden_dim)
    fresh["density_b"] = jax.random.uniform(kd, (1,), params["density_b"].dtype,
                                            -bound_d, bound_d)
    bound_r = 1.0 / math.sqrt(cfg.hidden_dim // 2)
    fresh["rgb_b"] = jax.random.uniform(kr, (3,), params["rgb_b"].dtype,
                                        -bound_r, bound_r)
    return fresh


def _matmul(x: jax.Array, w: jax.Array, b: jax.Array, cfg: NerfConfig) -> jax.Array:
    """x @ w + b with optional bf16 operands and fp32 accumulation (MXU-native).

    The float32 branch pins HIGHEST: a default-precision f32 matmul on TPU is
    ONE bf16 MXU pass (inputs truncated to 8 significand bits — see
    scripts/probe_mosaic_numerics.py), which would silently make
    compute_dtype="float32" identical to "bfloat16". Users choosing f32 mode
    are buying precision; speed is what the bfloat16 mode is for."""
    if cfg.compute_dtype == "bfloat16":
        y = jax.lax.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    else:
        y = jnp.matmul(x, w, precision=jax.lax.Precision.HIGHEST)
    return y + b


def _trunk(params: Params, pos_enc: jax.Array, cfg: NerfConfig) -> jax.Array:
    x = pos_enc
    for i in range(4):
        x = jax.nn.relu(_matmul(x, params[f"trunk0_{i}_w"], params[f"trunk0_{i}_b"], cfg))
    x = jnp.concatenate([x, pos_enc], axis=-1)  # skip concat, official_nerf.py:63
    for i in range(4):
        x = jax.nn.relu(_matmul(x, params[f"trunk1_{i}_w"], params[f"trunk1_{i}_b"], cfg))
    return x


def _occupancy(raw: jax.Array, cfg: NerfConfig) -> jax.Array:
    if cfg.occ_activation == "softplus":
        density = jax.nn.softplus(raw)
    else:
        density = jax.nn.relu(raw)
    if not cfg.dist_alpha:
        density = 1.0 - jnp.exp(-density)  # occupancy in [0,1), official_nerf.py:82-83
    return density


def nerf_density(params: Params, pts: jax.Array, cfg: NerfConfig) -> jax.Array:
    """Density/occupancy only (the reference's only_occupancy=True path)."""
    pos_enc = encode_position(pts, cfg.pos_enc_levels)
    x = _trunk(params, pos_enc, cfg)
    raw = _matmul(x, params["density_w"], params["density_b"], cfg)
    return _occupancy(raw, cfg)


def nerf_apply(params: Params, pts: jax.Array, ray_d: jax.Array,
               cfg: NerfConfig) -> Tuple[jax.Array, jax.Array]:
    """(rgb (M, 3), occupancy/density (M, 1)) for points (M, 3) and directions (M, 3).

    Reference: `OfficialStaticNerf.forward`, official_nerf.py:69-96 (return_addocc path).
    """
    pos_enc = encode_position(pts, cfg.pos_enc_levels)
    x = _trunk(params, pos_enc, cfg)
    raw = _matmul(x, params["density_w"], params["density_b"], cfg)
    density = _occupancy(raw, cfg)

    dir_enc = encode_position(ray_d, cfg.dir_enc_levels)
    feat = _matmul(x, params["feature_w"], params["feature_b"], cfg)
    h = jnp.concatenate([feat, dir_enc], axis=-1)
    h = jax.nn.relu(_matmul(h, params["rgb_hidden_w"], params["rgb_hidden_b"], cfg))
    rgb = jax.nn.sigmoid(_matmul(h, params["rgb_w"], params["rgb_b"], cfg))
    return rgb, density


def nerf_gradient(params: Params, pts: jax.Array, cfg: NerfConfig) -> jax.Array:
    """Negative spatial gradient of the *raw* density head wrt points -> (M, 3).

    The reference differentiates the pre-activation density (`infer_occ`) and negates
    (`official_nerf.py:46-58`); used for surface normals. One vjp instead of a
    torch.autograd.grad graph re-walk.
    """
    def raw_density_sum(p):
        pos_enc = encode_position(p, cfg.pos_enc_levels)
        x = _trunk(params, pos_enc, cfg)
        return jnp.sum(_matmul(x, params["density_w"], params["density_b"], cfg))

    return -jax.grad(raw_density_sum)(pts)
