"""Camera model and pixel/world transforms — pure JAX, unbatched-(N, ...) first.

Capability parity with the reference's L0 geometry (`model/common.py:13-237,405-457`),
with one deliberate TPU-first redesign: the reference inverts three 4x4 matrices and
chains three matmuls per render call (`transform_to_world`, `model/common.py:112-160`);
here the composition  P = scale_mat^-1 @ world_mat^-1 @ camera_mat^-1  is computed once
(4x4 work, negligible) and applied to all pixels as a single (N,4)x(4,4) matmul that XLA
maps straight onto the MXU.

All 4x4-transform applications pin HIGHEST matmul precision: TPU matmuls default
to bf16 multiplies, which would quantize ray origins/directions to ~3 decimal
digits and poison pose gradients.

Conventions (identical to the reference — the #1 parity risk, see SURVEY.md §7):
- pixels live in [-1, 1]^2 with x = 2*px/(W-1) - 1 (`arange_pixels`, common.py:13-40);
- the camera matrix is  K = [[2fx/W,0,0,0],[0,-2fy/H,0,0],[0,0,-1,0],[0,0,0,1]]
  (note the negated fy and -1 depth row; `dataloading/dataset.py:83-86`);
- world_mat = inverse(c2w); scale_mat is usually identity.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mm_exact(a: jax.Array, b: jax.Array) -> jax.Array:
    """f32-exact matmul for small pose/geometry products. TPU f32 matmuls
    DEFAULT to ONE bf16 MXU pass — inputs truncated to 8 significand bits
    (probed: (1+2^-10) @ I == 1.0; scripts/probe_mosaic_numerics.py) — which
    left ray directions ~9e-4 and lifted point clouds ~4e-3 off f32 truth
    before round 5 pinned every composition. HIGHEST is 6 passes of a single
    trivial tile at these 4x4 / (N,3)x(3,3) shapes: unmeasurable cost."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=32)
def _pixel_grid_np(resolution: Tuple[int, int],
                   image_range: Tuple[float, float],
                   dtype_name: str) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side pixel grid (cached): same op sequence as the previously
    traced version, computed by numpy — under jit the grid becomes a
    CONSTANT, hoisted out of the scan-fused step (the per-step
    meshgrid+stack cost 0.05 ms on v5e; docs/PERF.md round 4). NOTE: numpy's
    correctly-rounded division can differ from XLA's lowering of the same
    expression by 1 ulp on a minority of coordinates (~16% of lanes measured
    at w=621) — callers relying on bit-identity with an XLA recompute of the
    same formula get 1-ulp agreement, not bitwise."""
    h, w = resolution
    dtype = np.dtype(dtype_name)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    loc = np.stack([xs, ys], axis=-1).reshape(-1, 2)
    scale = dtype.type(image_range[1] - image_range[0])
    shift = dtype.type(scale / 2.0)
    px = scale * loc[:, 0].astype(dtype) / dtype.type(w - 1) - shift
    py = scale * loc[:, 1].astype(dtype) / dtype.type(h - 1) - shift
    return loc.astype(np.int32), np.stack([px, py], axis=-1)


def pixel_grid(resolution: Tuple[int, int],
               image_range: Tuple[float, float] = (-1.0, 1.0),
               dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """Integer pixel locations and scaled [-1,1] coordinates for an H x W image.

    Returns (locations (H*W, 2) int32 as (x, y), scaled (H*W, 2) float).
    Reference: `arange_pixels`, model/common.py:13-40 (row-major, x fastest).
    """
    loc, p = _pixel_grid_np(tuple(resolution), tuple(image_range),
                            np.dtype(dtype).name)
    return jnp.asarray(loc), jnp.asarray(p)


def rigid_inverse(T: jax.Array) -> jax.Array:
    """Closed-form inverse of a rigid 4x4 [R|t; 0 0 0 1]: [R^T | -R^T t].

    Every pose in this framework is rigid (exp-map rotations, LLFF poses, and
    their products), so this replaces jnp.linalg.inv — whose pivoted-LU lowers
    to a long serialized op chain on TPU — in the jitted step at ~1e-7 f32
    agreement. The gradient is the analytic transpose path (same math as
    inv's VJP for orthonormal R). The bottom row passes through unchanged.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -mm_exact(Rt, t)], axis=-1)
    return jnp.concatenate([top, T[..., 3:4, :]], axis=-2)


def diag4_inverse(M: jax.Array) -> jax.Array:
    """Inverse of a diagonal 4x4 — the framework's camera/scale matrix
    convention (K = diag(2fx/w, -2fy/h, -1, 1), dataset.py:83-86; scale mats
    are diag too). Exact reciprocal of the diagonal; NOT valid for a general
    matrix — callers own that invariant.
    """
    d = jnp.diagonal(M, axis1=-2, axis2=-1)
    return M * 0.0 + (1.0 / d)[..., None, :] * jnp.eye(4, dtype=M.dtype)


def camera_matrix_from_focal(fx: jax.Array, fy: jax.Array) -> jax.Array:
    """Build the 4x4 normalized camera matrix from focal lengths already expressed in
    the [-1,1] pixel convention (fx' = 2fx/W, fy' = 2fy/H), as the reference does when
    the focal is learned (`model/training.py:266-271`): K = diag(fx', -fy', -1, 1)."""
    fx = jnp.asarray(fx)
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    rows = [
        jnp.stack([fx, zero, zero, zero], -1),
        jnp.stack([zero, -fy, zero, zero], -1),
        jnp.stack([zero, zero, -one, zero], -1),
        jnp.stack([zero, zero, zero, one], -1),
    ]
    return jnp.stack(rows, -2)


def intrinsics_ndc(fx: float, fy: float, w: int, h: int) -> jnp.ndarray:
    """The dataset-side K build (`dataloading/dataset.py:83-86`): pixel-unit focals to
    the [-1,1] normalized camera matrix."""
    return camera_matrix_from_focal(jnp.asarray(2.0 * fx / w, jnp.float32),
                                    jnp.asarray(2.0 * fy / h, jnp.float32))


def intrinsics_ndc_np(fx: float, fy: float, w: int, h: int) -> np.ndarray:
    """Host-side numpy twin of intrinsics_ndc, for the data layer (scene loading
    and generation must not materialize device arrays — that would block on TPU
    backend init just to build a 4x4 constant)."""
    return np.array([[2.0 * fx / w, 0, 0, 0],
                     [0, -2.0 * fy / h, 0, 0],
                     [0, 0, -1, 0],
                     [0, 0, 0, 1]], np.float32)


def _compose_cam_to_world(camera_mat: jax.Array, world_mat: jax.Array,
                          scale_mat: Optional[jax.Array], invert: bool) -> jax.Array:
    """P such that p_world_h = P @ p_cam_h. With invert=True (the training path),
    P = scale^-1 @ world^-1 @ K^-1; otherwise P = scale @ world @ K."""
    if scale_mat is None:
        scale_mat = jnp.eye(4, dtype=camera_mat.dtype)
    if invert:
        # closed forms: K/scale are diagonal by convention, world is rigid —
        # pivoted-LU inv is a serialized op chain the jitted step paid 3x here
        camera_mat = diag4_inverse(camera_mat)
        world_mat = rigid_inverse(world_mat)
        scale_mat = diag4_inverse(scale_mat)
    return mm_exact(mm_exact(scale_mat, world_mat), camera_mat)


def transform_to_world(pixels: jax.Array, depth: jax.Array, camera_mat: jax.Array,
                       world_mat: Optional[jax.Array] = None,
                       scale_mat: Optional[jax.Array] = None,
                       invert: bool = True) -> jax.Array:
    """Lift [-1,1]-pixels (N, 2) with depth (N, 1) or (N,) to world points (N, 3).

    Reference semantics: homogeneous [px*d, py*d, d, 1] through
    scale^-1 @ world^-1 @ K^-1 (`model/common.py:112-160`).
    """
    if world_mat is None:
        world_mat = jnp.eye(4, dtype=pixels.dtype)
    P = _compose_cam_to_world(camera_mat, world_mat, scale_mat, invert)
    d = depth.reshape(-1, 1)
    hom = jnp.concatenate(
        [pixels * d, d, jnp.ones_like(d)], axis=-1)  # (N, 4)
    p_world = jnp.matmul(hom, P.T, precision=jax.lax.Precision.HIGHEST)
    return p_world[:, :3]


def origin_to_world(camera_mat: jax.Array, world_mat: jax.Array,
                    scale_mat: Optional[jax.Array] = None,
                    invert: bool = True) -> jax.Array:
    """Camera center in world coordinates, shape (3,).

    Reference repeats it per-ray (`model/common.py:186-215`); broadcasting makes the
    repeat free here.
    """
    P = _compose_cam_to_world(camera_mat, world_mat, scale_mat, invert)
    origin = jnp.zeros((4,), dtype=camera_mat.dtype).at[3].set(1.0)
    return mm_exact(P, origin[:, None])[:3, 0]


def image_points_to_world(pixels: jax.Array, camera_mat: jax.Array,
                          world_mat: jax.Array,
                          scale_mat: Optional[jax.Array] = None,
                          invert: bool = True) -> jax.Array:
    """Pixels at depth 1 lifted to world (N, 3) (`model/common.py:218-237`)."""
    ones = jnp.ones((pixels.shape[0], 1), dtype=pixels.dtype)
    return transform_to_world(pixels, ones, camera_mat, world_mat, scale_mat, invert)


def transform_to_camera_space(p_world: jax.Array, camera_mat: jax.Array,
                              world_mat: jax.Array,
                              scale_mat: Optional[jax.Array] = None) -> jax.Array:
    """World points (N, 3) -> camera space (N, 3) (`model/common.py:163-183`)."""
    if scale_mat is None:
        scale_mat = jnp.eye(4, dtype=p_world.dtype)
    M = mm_exact(mm_exact(camera_mat, world_mat), scale_mat)
    hom = jnp.concatenate([p_world, jnp.ones_like(p_world[:, :1])], axis=-1)
    return jnp.matmul(hom, M.T, precision=jax.lax.Precision.HIGHEST)[:, :3]


def rays_from_pixels(pixels: jax.Array, camera_mat: jax.Array, world_mat: jax.Array,
                     scale_mat: Optional[jax.Array] = None,
                     normalize: bool = True) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Ray origins/directions for a frame: one composed transform, two matmuls.

    Returns (origin (3,), ray_vector (N, 3), ray_norm (N,)). ray_vector is the
    un-normalized pixel_world - origin when normalize=False, matching the reference's
    `normalise_ray` switch (`model/rendering.py:59-65`).
    """
    P = _compose_cam_to_world(camera_mat, world_mat, scale_mat, invert=True)
    origin = mm_exact(P, jnp.zeros((4, 1), camera_mat.dtype).at[3, 0].set(1.0))[:3, 0]
    hom = jnp.concatenate(
        [pixels, jnp.ones_like(pixels[:, :1]), jnp.ones_like(pixels[:, :1])], axis=-1)
    pixels_world = jnp.matmul(hom, P.T,
                              precision=jax.lax.Precision.HIGHEST)[:, :3]
    ray_vec = pixels_world - origin
    ray_norm = jnp.linalg.norm(ray_vec, axis=-1)
    if normalize:
        ray_vec = ray_vec / ray_norm[:, None]
    return origin, ray_vec, ray_norm


def project_to_cam(points: jax.Array, camera_mat: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Project world-frame-free camera-space points (N, 3) through K; returns
    ([-1,1] xy (N, 2), valid mask (N, 1) bool). Reference: `model/common.py:436-457`.
    """
    hom = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=-1)
    xy = jnp.matmul(hom, camera_mat.T,
                    precision=jax.lax.Precision.HIGHEST)[:, :3]
    xy = xy[:, :2] / xy[:, 2:]
    valid = (jnp.max(jnp.abs(xy), axis=-1) <= 1.0)[:, None]
    return xy, valid


def reprojection(pixels: jax.Array, depth: jax.Array, Rt_ref: jax.Array,
                 world_mat: jax.Array, camera_mat: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Warp pixels of frame A into frame B: K @ Rt_ref @ world^-1 @ K^-1.
    Returns ([-1,1] xy (N,2), valid float mask (N,1)). Reference: common.py:405-435."""
    d = depth.reshape(-1, 1)
    hom = jnp.concatenate([pixels * d, d, jnp.ones_like(d)], axis=-1)
    M = mm_exact(mm_exact(mm_exact(camera_mat, Rt_ref),
                          rigid_inverse(world_mat)),
                 diag4_inverse(camera_mat))
    xy = jnp.matmul(hom, M.T, precision=jax.lax.Precision.HIGHEST)[:, :3]
    xy = xy[:, :2] / xy[:, 2:]
    valid = (jnp.max(jnp.abs(xy), axis=-1) <= 1.0)[:, None].astype(pixels.dtype)
    return xy, valid


def get_ndc_rays_fxfy(fxfy: jax.Array, near: float, rays_o: jax.Array,
                      rays_d: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """World rays -> NDC rays (for unbounded scenes). Reference: common.py:632-675."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]

    o0 = -fxfy[0] * ox_oz
    o1 = -fxfy[1] * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -fxfy[0] * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -fxfy[1] * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
