"""Image sampling/resizing ops with torch-matching semantics, in pure JAX.

The reference leans on torch's `grid_sample` (`model/common.py:75-109`
get_tensor_values) and `F.interpolate` nearest/bilinear/area (`model/training.py:357-366`,
`model/network.py:21`). Exact index arithmetic is reproduced here because sub-pixel
differences shift the photometric-warp loss. Resizes are expressed as two small
matmuls (row weights @ image @ col weights^T) — static shapes, MXU-friendly, no gathers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def grid_sample(image: jax.Array, points: jax.Array, mode: str = "bilinear",
                align_corners: bool = False) -> jax.Array:
    """Sample image (H, W, C) at [-1,1]^2 points (N, 2) -> (N, C).

    Matches torch.nn.functional.grid_sample with padding_mode='zeros':
    - align_corners=True:  ix = (x+1)/2 * (W-1)
    - align_corners=False: ix = ((x+1)*W - 1)/2
    Out-of-bounds taps contribute zero.
    """
    h, w, _ = image.shape
    x, y = points[:, 0], points[:, 1]
    if align_corners:
        ix = (x + 1.0) * 0.5 * (w - 1)
        iy = (y + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((x + 1.0) * w - 1.0) * 0.5
        iy = ((y + 1.0) * h - 1.0) * 0.5

    if mode == "nearest":
        # torch rounds with nearbyint (half-to-even), same as jnp.round
        ix_n = jnp.round(ix).astype(jnp.int32)
        iy_n = jnp.round(iy).astype(jnp.int32)
        valid = (ix_n >= 0) & (ix_n < w) & (iy_n >= 0) & (iy_n < h)
        ix_c = jnp.clip(ix_n, 0, w - 1)
        iy_c = jnp.clip(iy_n, 0, h - 1)
        vals = image[iy_c, ix_c]
        return jnp.where(valid[:, None], vals, jnp.zeros_like(vals))

    ix0 = jnp.floor(ix).astype(jnp.int32)
    iy0 = jnp.floor(iy).astype(jnp.int32)
    ix1, iy1 = ix0 + 1, iy0 + 1
    wx1 = ix - ix0.astype(ix.dtype)
    wy1 = iy - iy0.astype(iy.dtype)
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1

    def tap(iy_t, ix_t, w_t):
        valid = (ix_t >= 0) & (ix_t < w) & (iy_t >= 0) & (iy_t < h)
        v = image[jnp.clip(iy_t, 0, h - 1), jnp.clip(ix_t, 0, w - 1)]
        return jnp.where(valid[:, None], v, jnp.zeros_like(v)) * w_t[:, None]

    return (tap(iy0, ix0, wy0 * wx0) + tap(iy0, ix1, wy0 * wx1)
            + tap(iy1, ix0, wy1 * wx0) + tap(iy1, ix1, wy1 * wx1))


def get_tensor_values(image: jax.Array, points: jax.Array, mode: str = "nearest",
                      scale: bool = True, align_corners: bool = False) -> jax.Array:
    """Reference `get_tensor_values` (common.py:75-109) for an (H, W, C) image: points
    either already in [-1,1] (scale=False) or in pixel units (scale=True)."""
    if scale:
        h, w, _ = image.shape
        points = jnp.stack([2.0 * points[:, 0] / w - 1.0,
                            2.0 * points[:, 1] / h - 1.0], axis=-1)
    return grid_sample(image, points, mode=mode, align_corners=align_corners)


def _nearest_weight(out_size: int, in_size: int) -> np.ndarray:
    """Row-selection matrix for torch F.interpolate mode='nearest':
    src = floor(dst * in/out)."""
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    idx = np.minimum(idx, in_size - 1)
    w = np.zeros((out_size, in_size), np.float32)
    w[np.arange(out_size), idx] = 1.0
    return w


def _bilinear_weight(out_size: int, in_size: int) -> np.ndarray:
    """Weights for torch F.interpolate mode='bilinear', align_corners=False:
    src = (dst + 0.5) * in/out - 0.5, edge-clamped."""
    src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    t = (src - lo).astype(np.float32)
    w = np.zeros((out_size, in_size), np.float32)
    np.add.at(w, (np.arange(out_size), lo), 1.0 - t)
    np.add.at(w, (np.arange(out_size), hi), t)
    return w


def _area_weight(out_size: int, in_size: int) -> np.ndarray:
    """Weights for torch F.interpolate mode='area' (= adaptive average pooling):
    window [floor(i*in/out), ceil((i+1)*in/out)), uniform average."""
    w = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        start = int(np.floor(i * in_size / out_size))
        end = int(np.ceil((i + 1) * in_size / out_size))
        w[i, start:end] = 1.0 / (end - start)
    return w


def _resize_matmul(image: jax.Array, size: Tuple[int, int], weight_fn) -> jax.Array:
    """(H, W, C) -> (h, w, C) via precomputed (static-shape) weight matrices."""
    h_out, w_out = size
    h_in, w_in, c = image.shape
    if (h_out, w_out) == (h_in, w_in):
        # scale-1 resize is the identity for nearest/bilinear/area weights;
        # callers resize unconditionally (e.g. the trainer's depth-prior resize,
        # network.py:19-33 semantics) so this skips two HIGHEST-precision matmuls
        # per step when render res == prior res.
        return image
    wh = jnp.asarray(weight_fn(h_out, h_in))
    ww = jnp.asarray(weight_fn(w_out, w_in))
    # rows: (h_out, H) @ (H, W*C); HIGHEST precision — TPU matmuls default to
    # bf16 multiplies, which visibly degrades resized images/depths
    tmp = jnp.matmul(wh, image.reshape(h_in, w_in * c),
                     precision=jax.lax.Precision.HIGHEST).reshape(h_out, w_in, c)
    tmp = jnp.einsum("hwc,vw->hvc", tmp, ww,
                     precision=jax.lax.Precision.HIGHEST)
    return tmp


def resize_nearest(image: jax.Array, size: Tuple[int, int]) -> jax.Array:
    return _resize_matmul(image, size, _nearest_weight)


def resize_bilinear(image: jax.Array, size: Tuple[int, int]) -> jax.Array:
    return _resize_matmul(image, size, _bilinear_weight)


def resize_area(image: jax.Array, size: Tuple[int, int]) -> jax.Array:
    return _resize_matmul(image, size, _area_weight)
