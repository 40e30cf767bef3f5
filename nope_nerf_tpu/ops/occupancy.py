"""Occupancy-grid guided ray sampling — a TPU-native acceleration extension.

NO reference counterpart (the reference only has stratified/NDC sampling,
rendering.py:169-198). Inspired by NerfAcc's occupancy grids (PAPERS.md), but
re-designed for XLA's static-shape model: instead of *skipping* empty space
(which yields dynamic per-ray sample counts), the fixed per-ray budget of S
samples is REDISTRIBUTED toward occupied cells by inverse-CDF sampling over a
per-ray occupancy profile, with a uniform floor so unexplored space keeps
coverage. Everything is dense: the grid update is one batched MLP density
query over jittered cell centers, the per-ray profile is one gather, and the
redistribution reuses ops.render.sample_pdf — so the fused train kernel
(which takes arbitrary sorted z) is untouched.

Opt-in via `rendering.occupancy_grid: true`; the grid lives on device and is
EMA-updated between epochs (see training.trainer.Trainer.update_occupancy).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.nerf import NerfConfig, nerf_density


def make_occupancy_grid(res: int) -> jax.Array:
    """Fresh (res, res, res) grid. Starts fully occupied (1.0) so early training
    sees plain stratified coverage until real densities take over the EMA."""
    return jnp.ones((res, res, res), jnp.float32)


def grid_lookup(grid: jax.Array, points: jax.Array, radius: float) -> jax.Array:
    """Nearest-cell occupancy for world points (..., 3) in the [-radius, radius]^3
    cube. Points outside the cube read 0.0: the sampler's uniform floor keeps
    them covered exactly like learned-empty interior cells. (Reading 1.0 there
    would hand maximum weight to every beyond-radius probe and steal the sample
    budget from real surfaces whenever depth_range extends past the cube —
    size `rendering.radius` to cover the scene content.)"""
    res = grid.shape[0]
    ijk = jnp.floor((points + radius) * (res / (2.0 * radius))).astype(jnp.int32)
    inside = jnp.all((ijk >= 0) & (ijk < res), axis=-1)
    ijk = jnp.clip(ijk, 0, res - 1)
    flat = (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]
    occ = jnp.take(grid.reshape(-1), flat.reshape(-1)).reshape(flat.shape)
    return jnp.where(inside, occ, 0.0)


@functools.partial(jax.jit, static_argnames=("ncfg", "radius", "decay"))
def update_occupancy_grid(grid: jax.Array, nerf_params, key: jax.Array,
                          ncfg: NerfConfig, radius: float = 4.0,
                          decay: float = 0.95) -> jax.Array:
    """EMA occupancy update: grid' = max(grid * decay, alpha(cell)).

    One density query at a jittered point per cell; alpha converts density to
    per-cell opacity over one cell diagonal (the scale a ray segment through
    the cell would see), matching how the renderer's dist_alpha path consumes
    densities. With dist_alpha off the density head already emits occupancy in
    [0,1) and is used directly.
    """
    res = grid.shape[0]
    cell = 2.0 * radius / res
    centers = (jnp.stack(jnp.meshgrid(*([jnp.arange(res)] * 3), indexing="ij"),
                         -1).reshape(-1, 3) + 0.5) * cell - radius
    pts = centers + jax.random.uniform(key, centers.shape, minval=-0.5,
                                       maxval=0.5) * cell
    density = nerf_density(nerf_params, pts, ncfg)[..., 0]
    # cfg.dist_alpha=True -> density is sigma: alpha over a cell diagonal.
    # cfg.dist_alpha=False -> density IS occupancy in [0,1).
    alpha = 1.0 - jnp.exp(-density * cell * jnp.sqrt(3.0)) \
        if ncfg.dist_alpha else density
    return jnp.maximum(grid * decay, alpha.reshape(grid.shape))


def occupancy_z_samples(key, origin: jax.Array, ray_vec: jax.Array,
                        grid: jax.Array, steps: int,
                        depth_range: Tuple[float, float], radius: float,
                        floor: float, add_noise: bool,
                        dtype=jnp.float32) -> jax.Array:
    """(N, steps) sorted z values concentrated where the grid is occupied.

    Probes the grid at `steps` uniform depths along each ray, forms the
    piecewise-constant pdf w = occ + floor, and inverse-CDF samples the same
    budget of `steps` depths (ops.render.sample_pdf). add_noise=False gives the
    deterministic (midpoint) draw for eval-style rendering.

    sample_pdf drops its edge weights (weights[:, 1:-1]) and confines samples
    to the mid-point span, so the probe ladder is EXTENDED by one step beyond
    each end of depth_range: every in-range probe weight then participates,
    samples cover the boundary half-bins, and the result is clipped back to
    depth_range.
    """
    from .render import sample_pdf

    n = ray_vec.shape[0]  # origin is the shared camera centre (3,)
    near, far = depth_range
    h = (far - near) / (steps - 1)
    z_probe = jnp.linspace(near - h, far + h, steps + 2, dtype=dtype)
    z_probe = jnp.broadcast_to(z_probe, (n, steps + 2))
    pts = origin[None, None, :] + z_probe[..., None] * ray_vec[:, None, :]
    w = grid_lookup(grid, pts, radius) + floor
    z = sample_pdf(key, z_probe, w, steps, deterministic=not add_noise)
    return jnp.sort(jnp.clip(z, near, far), axis=-1)
