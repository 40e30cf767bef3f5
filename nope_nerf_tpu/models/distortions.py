"""Per-frame depth-prior distortion parameters (scale, shift).

Capability parity with `model/distortions.py:4-27` (Learn_Distortion): per-camera
learnable scale (init 1, clamped >= 0.01) and shift (init 0); optionally the last
frame's scale is pinned to 1 (fix_scaleN) to remove the global gauge freedom.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class DistortionConfig:
    num_cams: int
    learn_scale: bool = True
    learn_shift: bool = True
    fix_scaleN: bool = True

    @classmethod
    def from_cfg(cls, cfg: dict, num_cams: int) -> "DistortionConfig":
        return cls(num_cams=num_cams,
                   learn_scale=cfg["distortion"]["learn_scale"],
                   learn_shift=cfg["distortion"]["learn_shift"],
                   fix_scaleN=cfg["distortion"]["fix_scaleN"])


def init_distortion_params(cfg: DistortionConfig, dtype=jnp.float32) -> Params:
    return {
        "scale": jnp.ones((cfg.num_cams, 1), dtype),
        "shift": jnp.zeros((cfg.num_cams, 1), dtype),
    }


def distortion_scale_shift(params: Params, cam_id: jax.Array,
                           cfg: DistortionConfig) -> Tuple[jax.Array, jax.Array]:
    """(scale (1,), shift (1,)) for a (traced) camera index.

    The reference's `scale < 0.01 -> 0.01` replacement (`distortions.py:21-22`) is a
    hard, gradient-cutting substitution; jnp.where reproduces that exactly (the branch
    taken gets zero gradient to `scale` when clamped, same as torch's reassignment).
    """
    scale = params["scale"] if cfg.learn_scale else jax.lax.stop_gradient(params["scale"])
    shift = params["shift"] if cfg.learn_shift else jax.lax.stop_gradient(params["shift"])
    s = scale[cam_id]
    s = jnp.where(s < 0.01, jnp.asarray(0.01, s.dtype), s)
    if cfg.fix_scaleN:
        s = jnp.where(cam_id == cfg.num_cams - 1, jnp.ones_like(s), s)
    return s, shift[cam_id]
