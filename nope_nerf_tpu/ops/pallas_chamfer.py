"""Pallas kernel for the Chamfer nearest-neighbor sweep — the 2nd hot loop
(SURVEY.md §7.5; reference `model/losses.py:129-144` materializes an (S, D, 3)
difference tensor).

Design: the destination cloud (D_pad, 8) lives whole in VMEM (~a few hundred KB);
the grid walks source tiles; a fori_loop sweeps destination chunks computing
dist^2 = |x|^2 + |y|^2 - 2<x,y> on the MXU with a running (min, argmin) carry —
no (S, D) matrix ever touches HBM.

Backward (custom VJP, computed in XLA from the saved argmin — torch-autograd
semantics where the index is a constant):
  d||x - y_nn||/dx =  (x - y_nn)/dist,   d/dy_nn = -(x - y_nn)/dist (scatter-add).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.safemath import safe_norm

X_TILE = 512
Y_CHUNK = 1024
PAD_COORD = 1e9  # padded dst rows sit astronomically far away


def _pad_rows(a: jax.Array, mult: int, value: float) -> jax.Array:
    pad = (-a.shape[0]) % mult
    if pad:
        a = jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], value, a.dtype)], axis=0)
    return a


def _kernel(x_ref, y_ref, d2_ref, idx_ref):
    x = x_ref[:]                                  # (X_TILE, 8), cols 0-2 live
    xsq = jnp.sum(x * x, axis=-1, keepdims=True)  # (X_TILE, 1)
    n_chunks = y_ref.shape[0] // Y_CHUNK

    def body(c, carry):
        best_d2, best_i = carry
        y = y_ref[pl.ds(c * Y_CHUNK, Y_CHUNK), :]          # (Y_CHUNK, 8)
        ysq = jnp.sum(y * y, axis=-1)                      # (Y_CHUNK,)
        cross = jax.lax.dot_general(x, y, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        d2 = xsq + ysq[None, :] - 2.0 * cross              # (X_TILE, Y_CHUNK)
        m = jnp.min(d2, axis=1, keepdims=True)
        a = jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None] + c * Y_CHUNK
        take = m < best_d2
        return (jnp.where(take, m, best_d2), jnp.where(take, a, best_i))

    init = (jnp.full((x.shape[0], 1), jnp.inf, jnp.float32),
            jnp.zeros((x.shape[0], 1), jnp.int32))
    best_d2, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    d2_ref[:] = best_d2
    idx_ref[:] = best_i


def _nearest_idx(src: jax.Array, dst: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(min squared distance (S,), argmin (S,) int32) via the kernel."""
    s = src.shape[0]
    x = _pad_rows(jnp.pad(src, ((0, 0), (0, 8 - src.shape[1]))), X_TILE, 0.0)
    y = _pad_rows(jnp.pad(dst, ((0, 0), (0, 8 - dst.shape[1]))), Y_CHUNK,
                  PAD_COORD)
    grid = (x.shape[0] // X_TILE,)
    d2, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((X_TILE, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((y.shape[0], 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((X_TILE, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((X_TILE, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
                   jax.ShapeDtypeStruct((x.shape[0], 1), jnp.int32)],
    )(x, y)
    return d2[:s, 0], idx[:s, 0]


@jax.custom_vjp
def nearest_dists_pallas(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Euclidean distance from each src point to its nearest dst point (S,)."""
    _, idx = _nearest_idx(src, dst)
    return safe_norm(src - dst[idx], axis=-1)


def _nd_fwd(src, dst):
    _, idx = _nearest_idx(src, dst)
    diff = src - dst[idx]
    dist = safe_norm(diff, axis=-1)
    return dist, (diff, dist, idx, dst.shape[0])


def _nd_bwd(res, g):
    diff, dist, idx, n_dst = res
    unit = diff / jnp.maximum(dist, 1e-12)[:, None]
    dsrc = unit * g[:, None]
    ddst = jax.ops.segment_sum(-dsrc, idx, num_segments=n_dst)
    return dsrc, ddst


nearest_dists_pallas.defvjp(_nd_fwd, _nd_bwd)
