"""Gradient-safe primitives for exactly-degenerate inputs.

`jnp.linalg.norm` has a NaN gradient at exactly 0 (d|x|/dx = x/|x| = 0/0), and
the NaN survives multiplication by a zero cotangent — one exactly-coincident
Chamfer pair or one zero-depth masked pixel poisons the whole gradient. These
are not theoretical: identity-initialized poses make inter-frame point clouds
share EXACT points wherever the (centimeter-quantized) GT depth agrees, which
NaN'd training on V-KITTI-format data within a few steps. The reference has the
same failure mode (torch.norm grad at 0) and guards it with a runtime
breakpoint (losses.py:213-214); here the gradient is defined instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_norm(x: jax.Array, axis=-1, keepdims: bool = False) -> jax.Array:
    """L2 norm whose gradient at ||x|| == 0 is 0 (the minimum-norm subgradient)
    instead of NaN. Values are bit-identical to jnp.linalg.norm."""
    d2 = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    pos = d2 > 0
    # double-where: the inner select keeps the 0/0 out of the backward graph
    safe = jnp.sqrt(jnp.where(pos, d2, 1.0))
    return jnp.where(pos, safe, 0.0)
