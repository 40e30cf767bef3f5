"""Pallas kernels for the Chamfer nearest-neighbor sweep — the 2nd hot loop
(SURVEY.md §7.5; reference `model/losses.py:129-144` materializes an (S, D, 3)
difference tensor).

Two kernels:

- `nearest_dists_pallas` (one direction, kept for API compatibility): the
  destination cloud lives whole in VMEM; a fori_loop sweeps destination chunks
  with a running (min, argmin) carry.

- `nearest_idx_bidirectional_pallas` (the train-step path): ONE kernel produces
  BOTH argmin directions. The XLA scan formulation (ops/chamfer.py) is
  HBM-bound: each (S, tile) distance block leaves the MXU, is written to HBM,
  read back for the min/argmin sweep (~0.42 ms isolated at the trainer's
  pc_ratio=4 shapes, scripts/profile_glue2.py). Here the d2 block stays in
  VMEM, and min+argmin collapse into ONE vector op per entry per direction via
  a monotonic int32 packing: for d2 >= 0, bitcast(f32 d2) preserves order, so
  (bitcast(d2) & ~LOW_MASK) | col_index is minimized exactly when (d2-rounded,
  index) is lexicographically minimal. Masking the mantissa's low 13 bits
  costs ~2^-11 relative d2 resolution — same near-tie class as the XLA path's
  bf16 sweep (2^-8), and the caller recomputes the winner's exact f32
  distance, so the loss error stays bounded by the tie gap.

Gradients: the sweep outputs integer indices — no gradient flows through it;
the caller's gather + safe_norm tail carries torch-autograd-parity gradients
(the argmin index is a constant) into both clouds.
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
Y_CHUNK = 512
PAD_COORD = 1e9  # padded rows sit astronomically far away
IDX_BITS = 13    # index field of the packed (d2, idx) int32; caps clouds at 8192
IDX_MASK = (1 << IDX_BITS) - 1
INT_MAX = jnp.iinfo(jnp.int32).max


def _pad_rows(a: jax.Array, mult: int, value: float) -> jax.Array:
    pad = (-a.shape[0]) % mult
    if pad:
        a = jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], value, a.dtype)], axis=0)
    return a


def _aug8(a: jax.Array, sign: float) -> jax.Array:
    """[x | |x|^2-or-1 | 1-or-|y|^2 | 0] (N, 8): the augmented-coordinate
    factors of d2 = |x|^2 + |y|^2 - 2<x,y> as ONE MXU matmul (K=8)."""
    sq = jnp.sum(a * a, axis=-1, keepdims=True)
    one = jnp.ones_like(sq)
    zero = jnp.zeros_like(a[:, :1])
    if sign > 0:  # left factor: [x, |x|^2, 1, 0...]
        return jnp.concatenate([a, sq, one, zero, zero, zero], axis=-1)
    # right factor rows: [-2y, 1, |y|^2, 0...]
    return jnp.concatenate([-2.0 * a, one, sq, zero, zero, zero], axis=-1)


def _pack(d2: jax.Array, dim: int, off: int) -> jax.Array:
    """(T, C) f32 d2 -> int32 monotonic packing with the index along `dim`
    (+off) in the low bits. d2 is clamped at 0 (MXU rounding can give -1e-7 on
    coincident points; negative f32 bitcasts break monotonicity)."""
    di = jax.lax.bitcast_convert_type(jnp.maximum(d2, 0.0), jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, dim) + off
    return jnp.bitwise_or(jnp.bitwise_and(di, ~jnp.int32(IDX_MASK)), idx)


def _bidir_kernel(n_chunks: int, x_ref, y_ref, row_ref, col_ref):
    """Grid walks x tiles; y is VMEM-resident.
    row_ref (X_TILE, 1): packed row minima for this tile (final per tile).
    col_ref (8, Dp): packed col minima, accumulated across the whole grid
    (row 0 holds the data; 8 rows for sublane alignment)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        col_ref[:] = jnp.full_like(col_ref, INT_MAX)

    x = x_ref[:]                                   # (X_TILE, 8), cols 0-2 live
    xa = _aug8(x[:, :3], 1.0)                      # (X_TILE, 8)

    def body(c, row_best):
        y = y_ref[pl.ds(c * Y_CHUNK, Y_CHUNK), :]  # (Y_CHUNK, 8)
        ya = _aug8(y[:, :3], -1.0)
        d2 = jax.lax.dot_general(xa, ya, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # x -> y: pack the y column index, min over lanes
        packed_xy = _pack(d2, 1, c * Y_CHUNK)      # (X_TILE, Y_CHUNK) int32
        row_best = jnp.minimum(row_best, jnp.min(packed_xy, axis=1,
                                                 keepdims=True))
        # y -> x: pack the x row index, min over sublanes — no transpose
        packed_yx = _pack(d2, 0, i * x_ref.shape[0])
        part = jnp.min(packed_yx, axis=0)[None, :]   # (1, Y_CHUNK)
        cur = col_ref[0:1, pl.ds(c * Y_CHUNK, Y_CHUNK)]
        col_ref[0:1, pl.ds(c * Y_CHUNK, Y_CHUNK)] = jnp.minimum(cur, part)
        return row_best

    init = jnp.full((x.shape[0], 1), INT_MAX, jnp.int32)
    row_ref[:] = jax.lax.fori_loop(0, n_chunks, body, init)


def nearest_idx_bidirectional_pallas(
        x: jax.Array, y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(argmin_y d(x_i, y) (S,), argmin_x d(y_j, x) (D,)) — one fused sweep.

    Requires S, D <= 2^IDX_BITS (8192); the trainer's pc_ratio=4 V-KITTI
    shapes are ~7.3k. Falls back to the XLA path above that (ops/chamfer.py
    gates this)."""
    s, d = x.shape[0], y.shape[0]
    assert s <= (1 << IDX_BITS) and d <= (1 << IDX_BITS), (s, d)
    # int outputs carry no tangents; stop_gradient keeps autodiff from ever
    # attempting a JVP of the pallas_call (the caller's gather tail owns grads)
    x = jax.lax.stop_gradient(x)
    y = jax.lax.stop_gradient(y)
    xp = _pad_rows(jnp.pad(x.astype(jnp.float32),
                           ((0, 0), (0, 8 - x.shape[1]))), X_TILE, PAD_COORD)
    yp = _pad_rows(jnp.pad(y.astype(jnp.float32),
                           ((0, 0), (0, 8 - y.shape[1]))), Y_CHUNK, PAD_COORD)
    sp, dp = xp.shape[0], yp.shape[0]
    grid = (sp // X_TILE,)
    row, col = pl.pallas_call(
        functools.partial(_bidir_kernel, dp // Y_CHUNK),
        grid=grid,
        in_specs=[pl.BlockSpec((X_TILE, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((dp, 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((X_TILE, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, dp), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((sp, 1), jnp.int32),
                   jax.ShapeDtypeStruct((8, dp), jnp.int32)],
    )(xp, yp)
    idx_xy = jnp.bitwise_and(row[:s, 0], IDX_MASK)
    idx_yx = jnp.bitwise_and(col[0, :d], IDX_MASK)
    return idx_xy, idx_yx


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
