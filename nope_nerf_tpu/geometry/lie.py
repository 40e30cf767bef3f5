"""so(3)/SE(3) exp-maps as pure, vmappable JAX functions.

Capability parity with the reference's axis-angle pose parametrization
(`model/common.py:277-310` Exp/make_c2w, duplicated in `utils_poses/lie_group_helper.py`),
re-designed batched-first: the reference computes one 4x4 pose per Python call; here a
whole trajectory of N poses is one `vmap(make_c2w)` — a single fused XLA op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def vec2skew(v: jax.Array) -> jax.Array:
    """(..., 3) axis-angle vector -> (..., 3, 3) skew-symmetric matrix."""
    zero = jnp.zeros_like(v[..., 0])
    row0 = jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1)
    row1 = jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1)
    row2 = jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def exp_so3(r: jax.Array) -> jax.Array:
    """so(3) -> SO(3) Rodrigues exp-map, (..., 3) -> (..., 3, 3).

    Matches the reference formula (`model/common.py:290-299`), with the norm computed
    as sqrt(max(|r|^2, 1e-12)): below |r| = 1e-6 the Rodrigues coefficients
    sin(n)/n and (1-cos n)/n^2 are 1 and 0.5 to float32 precision (multiplied by a
    skew that is O(|r|)), so the value matches the reference's `norm + 1e-15` shift,
    while the gradient at r = 0 is 0 — the same subgradient convention torch's
    `.norm()` uses. A smaller clamp would NaN: the VJP of (1-cos n)/n^2 divides by
    n^4, which underflows float32 for n < ~1e-9.
    """
    skew = vec2skew(r)
    sq = jnp.sum(r * r, axis=-1)[..., None, None]
    norm = jnp.sqrt(jnp.maximum(sq, 1e-12))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), skew.shape)
    # HIGHEST: TPU f32 matmuls default to one bf16 pass (see
    # geometry/camera.mm_exact) — a quantized R poisons pose training
    skew2 = jnp.matmul(skew, skew, precision=jax.lax.Precision.HIGHEST)
    return eye + (jnp.sin(norm) / norm) * skew + ((1.0 - jnp.cos(norm)) / norm**2) * skew2


def log_so3(R: jax.Array, eps: float = 1e-7) -> jax.Array:
    """SO(3) -> so(3) log map, (..., 3, 3) -> (..., 3) (used by pose-eval alignment;
    reference counterpart: vendored `ATE/transformations.py` rotation conversions)."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    scale = theta / (2.0 * jnp.sin(theta) + eps)
    return w * scale[..., None]


def make_c2w(r: jax.Array, t: jax.Array) -> jax.Array:
    """(axis-angle (..., 3), translation (..., 3)) -> (..., 4, 4) camera-to-world.

    Reference: `model/common.py:301-310`.
    """
    R = exp_so3(r)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def convert3x4_4x4(mat: jax.Array) -> jax.Array:
    """(..., 3, 4) -> (..., 4, 4) by appending a [0,0,0,1] row
    (reference: `model/common.py:312-330`)."""
    bottom = jnp.zeros_like(mat[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([mat, bottom], axis=-2)
