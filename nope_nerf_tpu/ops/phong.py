"""Phong geometry visualization renderer: sphere-bounded ray marching + secant
surface refinement + Lambertian shading.

Capability parity with the reference's second rendering technique
(`Renderer.phong_renderer` model/rendering.py:203-275, `ray_marching` :278-387,
`secant` :389-419, `get_sphere_intersection` :440-459).

TPU-first redesign: the reference's data-dependent gathers (masked secant batches)
become static-shape masked computation; the 512-step occupancy scan is one (N, S)
batched MLP evaluation; the secant refinement is a fori_loop over all rays with the
miss-mask folded into the result. Everything jits into one program.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..geometry.camera import rays_from_pixels
from ..models.nerf import NerfConfig, nerf_apply, nerf_density, nerf_gradient


def get_sphere_intersection(cam_loc: jax.Array, ray_directions: jax.Array,
                            r: float = 1.0):
    """Near/far sphere hits per ray ((N,2) clamped >= 0, (N,) hit mask)
    (rendering.py:440-459)."""
    ray_cam_dot = ray_directions @ cam_loc
    under_sqrt = ray_cam_dot ** 2 - (jnp.sum(cam_loc ** 2) - r ** 2)
    mask = under_sqrt > 0
    sq = jnp.sqrt(jnp.maximum(under_sqrt, 0.0))
    hits = jnp.stack([-sq - ray_cam_dot, sq - ray_cam_dot], axis=-1)
    hits = jnp.where(mask[:, None], hits, jnp.zeros_like(hits))
    return jnp.maximum(hits, 0.0), mask


def ray_marching(nerf_params, origin: jax.Array, ray_dirs: jax.Array,
                 ncfg: NerfConfig, tau: float = 0.5, n_steps: int = 512,
                 n_secant_steps: int = 8, radius: float = 4.0,
                 depth_range0: float = 0.0):
    """First-crossing surface depth per ray; +inf where no surface, 0 where the
    first sample is already occupied (rendering.py:278-387 semantics)."""
    n = ray_dirs.shape[0]
    d_far, _ = get_sphere_intersection(origin, ray_dirs, r=radius)
    d_far = d_far[:, 1]

    t = jnp.linspace(0.0, 1.0, n_steps)
    d_prop = depth_range0 * (1.0 - t)[None, :] + d_far[:, None] * t[None, :]
    pts = origin[None, None, :] + ray_dirs[:, None, :] * d_prop[..., None]
    val = nerf_density(nerf_params, pts.reshape(-1, 3), ncfg).reshape(n, n_steps) - tau

    first_free = val[:, 0] < 0  # camera not inside the surface

    # first sign change: reference builds a sign/cost matrix and argmins
    # (rendering.py:336-345); equivalent here via masked argmax of crossings.
    sign_change = jnp.sign(val[:, :-1] * val[:, 1:]) < 0
    crossing_neg2pos = sign_change & (val[:, :-1] < 0)
    any_cross = jnp.any(crossing_neg2pos, axis=1)
    idx = jnp.argmax(crossing_neg2pos, axis=1)  # first True

    mask = any_cross & first_free

    take = lambda a, i: jnp.take_along_axis(a, i[:, None], axis=1)[:, 0]
    d_low = take(d_prop, idx)
    f_low = take(val, idx)
    idx_hi = jnp.minimum(idx + 1, n_steps - 1)
    d_high = take(d_prop, idx_hi)
    f_high = take(val, idx_hi)

    # secant iterations on every ray (rendering.py:389-419) — misses masked later
    def body(_, carry):
        d_low, f_low, d_high, f_high, d_pred = carry
        p_mid = origin[None, :] + d_pred[:, None] * ray_dirs
        f_mid = nerf_density(nerf_params, p_mid, ncfg)[:, 0] - tau
        low = f_mid < 0
        d_low = jnp.where(low, d_pred, d_low)
        f_low = jnp.where(low, f_mid, f_low)
        d_high = jnp.where(low, d_high, d_pred)
        f_high = jnp.where(low, f_high, f_mid)
        d_pred = -f_low * (d_high - d_low) / (f_high - f_low + 1e-12) + d_low
        return d_low, f_low, d_high, f_high, d_pred

    d_pred0 = -f_low * (d_high - d_low) / (f_high - f_low + 1e-12) + d_low
    *_, d_pred = jax.lax.fori_loop(0, n_secant_steps, body,
                                   (d_low, f_low, d_high, f_high, d_pred0))

    d_out = jnp.where(mask, d_pred, jnp.inf)
    d_out = jnp.where(first_free, d_out, 0.0)  # rendering.py:386
    return d_out, mask


def phong_render(nerf_params, pixels: jax.Array, camera_mat: jax.Array,
                 world_mat: jax.Array, scale_mat: Optional[jax.Array],
                 ncfg: NerfConfig, radius: float = 4.0,
                 n_steps: int = 512) -> Dict[str, jax.Array]:
    """Lambertian surface shading of the implicit geometry (rendering.py:203-275).

    Returns {'rgb': (N,3) shaded, 'rgb_surf': (N,3) model color at the surface,
    'mask': (N,) hit mask, 'depth': (N,)}.
    """
    origin, ray_dirs, _ = rays_from_pixels(pixels, camera_mat, world_mat,
                                           scale_mat, normalize=True)
    d_i, mask = ray_marching(jax.lax.stop_gradient(nerf_params), origin, ray_dirs,
                             ncfg, radius=radius, n_steps=n_steps)

    dists = jnp.where(jnp.isfinite(d_i), d_i, 1.0)
    points = origin[None, :] + ray_dirs * dists[:, None]

    # light co-located with the camera (rendering.py:215-217)
    light = origin / jnp.linalg.norm(origin)
    diffuse_per = jnp.asarray([0.7, 0.7, 0.7])
    ambient = jnp.asarray([0.3, 0.3, 0.3])

    grad = nerf_gradient(nerf_params, points, ncfg)
    normals = grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-12)
    diffuse = jnp.clip(normals @ light, 0.0, None)[:, None] * diffuse_per[None, :]
    shaded = jnp.clip(ambient[None, :] + diffuse, None, 1.0)
    rgb = jnp.where(mask[:, None], shaded, jnp.ones_like(shaded))

    surf_rgb, _ = nerf_apply(nerf_params, points, -ray_dirs, ncfg)
    rgb_surf = jnp.where(mask[:, None], surf_rgb, jnp.zeros_like(surf_rgb))

    return {"rgb": rgb, "rgb_surf": rgb_surf, "mask": mask,
            "depth": jnp.where(mask, dists, 0.0)}
