"""Per-frame SE(3) camera pose parameters.

Capability parity with `model/poses.py:6-34` (LearnPose): per-camera axis-angle r and
translation t, optionally composed on top of a frozen init pose (delta-pose mode).

TPU-first: the reference materializes ONE pose per Python call (`forward(cam_id)`,
an int index); here poses are (N, 3)+(N, 3) arrays, a single pose is a gather + exp-map
inside the jitted step, and the full trajectory (for the dist loss / ATE eval) is one
vmapped exp-map. learn_R/learn_t gating is done with stop_gradient rather than
requires_grad, so the same pytree flows through optax untouched.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..geometry.lie import make_c2w

Params = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class PoseConfig:
    num_cams: int
    learn_R: bool = True
    learn_t: bool = True
    use_init_c2w: bool = False

    @classmethod
    def from_cfg(cls, cfg: dict, num_cams: int) -> "PoseConfig":
        return cls(num_cams=num_cams,
                   learn_R=cfg["pose"]["learn_R"],
                   learn_t=cfg["pose"]["learn_t"],
                   use_init_c2w=cfg["pose"]["init_pose"])


def init_pose_params(cfg: PoseConfig, init_c2w: Optional[jax.Array] = None,
                     dtype=jnp.float32) -> Params:
    params: Params = {
        "r": jnp.zeros((cfg.num_cams, 3), dtype),
        "t": jnp.zeros((cfg.num_cams, 3), dtype),
    }
    if cfg.use_init_c2w:
        assert init_c2w is not None, "use_init_c2w=True requires init poses"
        params["init_c2w"] = jnp.asarray(init_c2w, dtype)
    return params


def _gated(params: Params, cfg: PoseConfig):
    r = params["r"] if cfg.learn_R else jax.lax.stop_gradient(params["r"])
    t = params["t"] if cfg.learn_t else jax.lax.stop_gradient(params["t"])
    return r, t


def pose_c2w(params: Params, cam_id: jax.Array, cfg: PoseConfig) -> jax.Array:
    """c2w (4, 4) for one camera index (traced or static). Reference: poses.py:23-31."""
    r, t = _gated(params, cfg)
    c2w = make_c2w(r[cam_id], t[cam_id])
    if cfg.use_init_c2w:
        c2w = jnp.matmul(c2w, jax.lax.stop_gradient(params["init_c2w"])[cam_id],
                         precision=jax.lax.Precision.HIGHEST)
    return c2w


def pose_c2w_all(params: Params, cfg: PoseConfig) -> jax.Array:
    """All N c2ws as (N, 4, 4) — one vmapped exp-map (the reference loops N Python
    calls, `train.py:282`)."""
    r, t = _gated(params, cfg)
    c2ws = jax.vmap(make_c2w)(r, t)
    if cfg.use_init_c2w:
        c2ws = jnp.matmul(c2ws, jax.lax.stop_gradient(params["init_c2w"]),
                          precision=jax.lax.Precision.HIGHEST)
    return c2ws


def pose_translations(params: Params, cfg: PoseConfig) -> jax.Array:
    """The raw t parameters (N, 3) used by the trajectory-smoothness loss
    (reference `LearnPose.get_t`, poses.py:32-34)."""
    _, t = _gated(params, cfg)
    return t
