"""Volume rendering: ray generation -> stratified sampling -> MLP -> compositing.

Capability parity with the reference renderer's `nope_nerf` technique
(`model/rendering.py:36-198`), re-designed as one pure function jitted end-to-end:
- no Python chunk loop (reference `rendering.py:102-111` chunks at 64000 points to fit
  GPU memory; on TPU the whole ray batch stays HBM-resident and XLA fuses
  encode->MLP->composite into one program — the Pallas kernel in ops/pallas_mlp.py
  fuses it further);
- the depth-prior branch, alpha variants (dist_alpha), white background, eval-time
  dist->depth renormalization, and mask semantics match the reference exactly;
- masked outputs are returned as (full array, bool mask) pairs instead of dynamically
  shaped gathers (`rendering.py:150-156`) — dynamic shapes would force recompilation
  under jit; losses consume the masks.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.camera import (
    get_ndc_rays_fxfy,
    rays_from_pixels,
    transform_to_world,
)
from ..models.nerf import NerfConfig, nerf_apply, nerf_gradient
from ..utils.safemath import safe_norm

EPSILON = 1e-6  # compositing epsilon, reference model/rendering.py:9


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    num_points: int = 128            # samples per ray
    outside_steps: int = 0
    depth_range: Tuple[float, float] = (0.01, 10.0)
    white_background: bool = False
    dist_alpha: bool = False
    use_ray_dir: bool = True
    normalise_ray: bool = True
    normal_loss: bool = False
    sample_option: str = "uniform"   # 'uniform' | 'ndc'
    # Hierarchical (importance) sampling: extra fine samples per ray drawn from the
    # coarse weight distribution. 0 = off (reference parity — the reference has no
    # hierarchical sampler; this is a TPU-build extension per the north star).
    n_importance: int = 0
    # Occupancy-grid guided sampling (ops/occupancy.py; static params — the grid
    # itself is a runtime array threaded as `occ_grid`).
    occ_radius: float = 4.0
    occ_floor: float = 0.01

    @classmethod
    def from_cfg(cls, cfg: dict) -> "RenderConfig":
        r = cfg["rendering"]
        return cls(num_points=r["num_points"],
                   outside_steps=r["outside_steps"],
                   depth_range=tuple(r["depth_range"]),
                   white_background=r["white_background"],
                   dist_alpha=r["dist_alpha"],
                   use_ray_dir=r["use_ray_dir"],
                   normalise_ray=r["normalise_ray"],
                   normal_loss=r["normal_loss"],
                   sample_option=r["sample_option"],
                   n_importance=r.get("n_importance", 0),
                   occ_radius=r.get("radius", 4.0),
                   occ_floor=r.get("occupancy_floor", 0.01))


def sample_uniform(key: Optional[jax.Array], n_rays: int, steps: int,
                   depth_range: Tuple[float, float], add_noise: bool,
                   dtype=jnp.float32) -> jax.Array:
    """Stratified z values (n_rays, steps) on [near, far].

    Matches `Renderer.sample_uniform` (rendering.py:183-198): linspace mapped by
    near*(1-z) + far*z, then per-interval uniform jitter between bin midpoints.
    """
    z = jnp.linspace(0.0, 1.0, steps, dtype=dtype)
    z = depth_range[0] * (1.0 - z) + depth_range[1] * z
    z = jnp.broadcast_to(z, (n_rays, steps))
    if add_noise:
        assert key is not None
        mid = 0.5 * (z[:, 1:] + z[:, :-1])
        high = jnp.concatenate([mid, z[:, -1:]], axis=-1)
        low = jnp.concatenate([z[:, :1], mid], axis=-1)
        noise = jax.random.uniform(key, (n_rays, steps), dtype)
        z = low + (high - low) * noise
    return z


def sample_pdf(key: jax.Array, z_vals: jax.Array, weights: jax.Array,
               n_importance: int, deterministic: bool = False) -> jax.Array:
    """Inverse-CDF importance sampling of n_importance extra depths per ray.

    NO reference counterpart — the reference only has stratified/NDC sampling;
    this is the classic NeRF hierarchical sampler (BASELINE.json north star),
    implemented with static shapes: piecewise-constant pdf over z-interval
    midpoints, searchsorted inversion. Returns (N, n_importance), unsorted.
    """
    mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])            # (N, S-1)
    w = weights[:, 1:-1] + 1e-5                              # interior weights
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (N, S-1)

    n = z_vals.shape[0]
    if deterministic:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0 - 1e-5, n_importance),
                             (n, n_importance))
    else:
        u = jax.random.uniform(key, (n, n_importance), z_vals.dtype,
                               0.0, 1.0 - 1e-5)

    idx = jax.vmap(jnp.searchsorted, in_axes=(0, 0))(cdf, u)  # right bin edge
    below = jnp.clip(idx - 1, 0, cdf.shape[1] - 1)
    above = jnp.clip(idx, 0, cdf.shape[1] - 1)

    cdf_b = jnp.take_along_axis(cdf, below, axis=1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=1)
    mid_b = jnp.take_along_axis(mids, jnp.clip(below, 0, mids.shape[1] - 1), axis=1)
    mid_a = jnp.take_along_axis(mids, jnp.clip(above, 0, mids.shape[1] - 1), axis=1)

    denom = jnp.where(cdf_a - cdf_b < 1e-8, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return mid_b + t * (mid_a - mid_b)


def composite(rgb: jax.Array, alpha: jax.Array,
              z_val: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Alpha compositing: weights w_i = a_i * prod_{j<i}(1 - a_j + eps).

    Reference formula (rendering.py:124-126), including the epsilon *inside* the
    cumulative product. Returns (rgb (N,3), expected distance (N,), weights (N,S)).
    """
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :1]), 1.0 - alpha + EPSILON], axis=-1),
        axis=-1)[:, :-1]
    weights = alpha * trans
    rgb_out = jnp.sum(weights[..., None] * rgb, axis=-2)
    dist = jnp.sum(weights * z_val, axis=-1)
    return rgb_out, dist, weights


def _ray_geometry(pixels: jax.Array, depth_prior: Optional[jax.Array],
                  camera_mat: jax.Array, world_mat: jax.Array,
                  scale_mat: Optional[jax.Array], key: Optional[jax.Array],
                  rcfg: RenderConfig, add_noise: bool,
                  occ_grid: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """Pre-MLP ray work shared by render_nope_nerf and the train-fused loss
    path (identical RNG stream and numerics): ray gen, prior-depth surface
    distance + masks (rendering.py:53-65), z sampling (stratified or NDC)."""
    n_rays = pixels.shape[0]
    dtype = pixels.dtype
    origin, ray_vec, ray_norm = rays_from_pixels(
        pixels, camera_mat, world_mat, scale_mat, normalize=rcfg.normalise_ray)

    if depth_prior is None:
        depth_prior = jnp.ones((n_rays, 1), dtype)
    points_world = transform_to_world(pixels, depth_prior, camera_mat,
                                      world_mat, scale_mat)
    # safe_norm: sparse-depth priors carry EXACT zeros at invalid pixels;
    # plain norm's 0/0 gradient there would poison the distortion/pose
    # grads even though the loss masks those rays (0 * NaN = NaN).
    d_i_src = safe_norm(points_world - origin, axis=-1)
    if not rcfg.normalise_ray:
        d_i_src = d_i_src / ray_norm  # dist -> depth for guide sampling

    mask_zero = d_i_src == 0.0
    mask_pred = jnp.isfinite(d_i_src)
    dists = jnp.where(mask_pred, d_i_src, jnp.ones_like(d_i_src))
    dists = jnp.where(mask_zero, jnp.zeros_like(dists), dists)
    object_mask = mask_pred & (~mask_zero)

    if key is not None:
        key, knoise, knormal = jax.random.split(key, 3)
    else:
        knoise = knormal = None
    fg_steps = rcfg.num_points - rcfg.outside_steps
    ndc_o = ndc_d = None
    if rcfg.sample_option == "ndc":
        fxfy = jnp.stack([camera_mat[0, 0], camera_mat[1, 1]])
        ndc_o, ndc_d = get_ndc_rays_fxfy(fxfy, 1.0, origin[None, :], ray_vec)
        z_val = jnp.broadcast_to(jnp.linspace(0.0, 1.0, fg_steps, dtype=dtype),
                                 (n_rays, fg_steps))
    elif occ_grid is not None:
        from .occupancy import occupancy_z_samples
        z_val = occupancy_z_samples(knoise, origin, ray_vec, occ_grid, fg_steps,
                                    rcfg.depth_range, rcfg.occ_radius,
                                    rcfg.occ_floor, add_noise, dtype)
    else:
        z_val = sample_uniform(knoise, n_rays, fg_steps, rcfg.depth_range,
                               add_noise, dtype)
    return {"origin": origin, "ray_vec": ray_vec, "ray_norm": ray_norm,
            "d_i_src": d_i_src, "dists": dists, "object_mask": object_mask,
            "z_val": z_val, "ndc_o": ndc_o, "ndc_d": ndc_d,
            "key": key, "knormal": knormal}


def fused_train_eligible(rcfg: RenderConfig, ncfg: NerfConfig,
                         n_rays: int) -> bool:
    """Static check: can the train step use the single-kernel fused loss path
    (ops/pallas_render.render_ray_loss_fused)?"""
    fg_steps = rcfg.num_points - rcfg.outside_steps
    return (ncfg.use_pallas and rcfg.n_importance == 0
            and rcfg.outside_steps == 0 and not rcfg.normal_loss
            and fg_steps % 128 == 0 and n_rays % 8 == 0)


def fused_train_prepare(pixels: jax.Array, depth_prior: Optional[jax.Array],
                        camera_mat: jax.Array, world_mat: jax.Array,
                        scale_mat: Optional[jax.Array], key: Optional[jax.Array],
                        rcfg: RenderConfig, ncfg: NerfConfig, add_noise: bool,
                        occ_grid: Optional[jax.Array] = None):
    """Geometry for the train-fused kernel: (ray_table (N,128), z (N,S),
    depth_gt (N,) in loss space, object_mask (N,) bool). Numerically identical
    (same RNG stream) to what render_nope_nerf would feed render_rays_fused."""
    from .pallas_render import pack_rays

    geo = _ray_geometry(pixels, depth_prior, camera_mat, world_mat, scale_mat,
                        key, rcfg, add_noise, occ_grid=occ_grid)
    if rcfg.use_ray_dir:
        mlp_dir = -geo["ray_vec"]
    else:
        mlp_dir = jnp.ones_like(geo["ray_vec"])
    if rcfg.sample_option == "ndc":
        ray_table = pack_rays(geo["ndc_o"], geo["ndc_d"], mlp_dir)
    else:
        ray_table = pack_rays(geo["origin"], geo["ray_vec"], mlp_dir)
    depth_gt = geo["d_i_src"]
    if rcfg.sample_option == "ndc":
        depth_gt = 1.0 - 1.0 / depth_gt  # rendering.py:158-159
    return ray_table, geo["z_val"], depth_gt, geo["object_mask"]


def render_nope_nerf(nerf_params: Dict[str, jax.Array],
                     pixels: jax.Array,
                     depth_prior: Optional[jax.Array],
                     camera_mat: jax.Array,
                     world_mat: jax.Array,
                     scale_mat: Optional[jax.Array],
                     key: Optional[jax.Array],
                     rcfg: RenderConfig,
                     ncfg: NerfConfig,
                     add_noise: bool = True,
                     eval_: bool = False,
                     need_aux: bool = True,
                     occ_grid: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """Render N rays of one frame. Returns a dict of full arrays + masks.

    need_aux=False (eval/vis renders) skips materializing the (N,S)
    weights/alpha/z_vals outputs — 128 MB of HBM writes per 131k-ray chunk that
    nothing downstream reads; the dict then carries None for those keys.

    Output keys (parity with rendering.py:160-167, with masks instead of gathers):
      rgb (N,3), z_vals (N,S), alpha (N,S), depth_pred (N,), depth_gt (N,),
      object_mask (N,) bool, normal (2K,) optional.
    """
    n_rays = pixels.shape[0]
    steps = rcfg.num_points
    dtype = pixels.dtype

    geo = _ray_geometry(pixels, depth_prior, camera_mat, world_mat, scale_mat,
                        key, rcfg, add_noise, occ_grid=occ_grid)
    origin, ray_vec, ray_norm = geo["origin"], geo["ray_vec"], geo["ray_norm"]
    d_i_src, dists, object_mask = geo["d_i_src"], geo["dists"], geo["object_mask"]
    z_val, ndc_o, ndc_d = geo["z_val"], geo["ndc_o"], geo["ndc_d"]
    key, knormal = geo["key"], geo["knormal"]
    fg_steps = steps - rcfg.outside_steps

    # Fully-fused path: rays + z go straight into one Pallas program (encode ->
    # MLP -> heads -> composite); per-point (M,3) arrays never materialize. See
    # ops/pallas_render.py for when the unfused path below is required instead.
    use_fused = (ncfg.use_pallas and rcfg.n_importance == 0
                 and rcfg.outside_steps == 0
                 and fg_steps % 128 == 0 and n_rays % 8 == 0)
    if use_fused:
        from .pallas_render import (pack_rays, render_rays_fused,
                                    render_rays_fused_noaux)
        if rcfg.use_ray_dir:
            mlp_dir = -ray_vec
        else:
            mlp_dir = jnp.ones_like(ray_vec)
        if rcfg.sample_option == "ndc":
            ray_table = pack_rays(ndc_o, ndc_d, mlp_dir)
        else:
            ray_table = pack_rays(origin, ray_vec, mlp_dir)
        if not need_aux and not rcfg.white_background:
            rgb_values, dist_pred = render_rays_fused_noaux(
                nerf_params, ray_table, z_val, ncfg, rcfg.dist_alpha)
            weights = alpha = None
        else:
            rgb_values, dist_pred, weights, alpha = render_rays_fused(
                nerf_params, ray_table, z_val, ncfg, rcfg.dist_alpha)
    else:
        if rcfg.sample_option == "ndc":
            pts = ndc_o[:, None, :] + ndc_d[:, None, :] * z_val[..., None]
        else:
            pts = origin[None, None, :] + ray_vec[:, None, :] * z_val[..., None]

        def _query_mlp(pts, dirs):
            if ncfg.use_pallas:
                from .pallas_mlp import nerf_apply_fused
                return nerf_apply_fused(nerf_params, pts.reshape(-1, 3),
                                        dirs.reshape(-1, 3), ncfg)
            return nerf_apply(nerf_params, pts.reshape(-1, 3),
                              dirs.reshape(-1, 3), ncfg)

        def _dirs_for(pts):
            # Direction the MLP sees is the *negated* ray (rendering.py:179,196).
            if rcfg.use_ray_dir:
                return jnp.broadcast_to(-ray_vec[:, None, :], pts.shape)
            return jnp.ones_like(pts)

        dirs = _dirs_for(pts)

        if rcfg.n_importance > 0 and rcfg.sample_option != "ndc":
            # Hierarchical pass (no reference counterpart): coarse weights ->
            # inverse-CDF resample -> merged, sorted sample set re-queried.
            rgb_c, density_c = _query_mlp(pts, dirs)
            alpha_c = density_c.reshape(n_rays, fg_steps)
            if rcfg.dist_alpha:
                deltas_c = jnp.concatenate(
                    [z_val[:, 1:] - z_val[:, :-1],
                     jnp.full_like(z_val[:, :1], 1e10)], axis=-1)
                alpha_c = 1.0 - jnp.exp(-alpha_c * deltas_c)
            _, _, w_coarse = composite(rgb_c.reshape(n_rays, fg_steps, 3),
                                       alpha_c, z_val)
            kfine = jax.random.fold_in(key, 1) if key is not None else None
            z_fine = sample_pdf(kfine, z_val, jax.lax.stop_gradient(w_coarse),
                                rcfg.n_importance, deterministic=key is None)
            z_val = jnp.sort(jnp.concatenate([z_val, z_fine], axis=-1), axis=-1)
            steps = fg_steps + rcfg.n_importance
            pts = origin[None, None, :] + ray_vec[:, None, :] * z_val[..., None]
            dirs = _dirs_for(pts)

        rgb, density = _query_mlp(pts, dirs)
        rgb = rgb.reshape(n_rays, steps, 3)
        alpha = density.reshape(n_rays, steps)

        if rcfg.dist_alpha:
            # delta-scaled opacity with forced last-sample hit
            # (rendering.py:116-122)
            deltas = z_val[:, 1:] - z_val[:, :-1]
            deltas = jnp.concatenate(
                [deltas, jnp.full_like(deltas[:, :1], 1e10)], axis=-1)
            alpha = 1.0 - jnp.exp(-alpha * deltas)
            alpha = alpha.at[:, -1].set(1.0)

        rgb_values, dist_pred, weights = composite(rgb, alpha, z_val)

    normal_diff = None
    if rcfg.normal_loss and not eval_:
        # Perturbed-point normal smoothness (rendering.py:127-137). Computed at every
        # ray's prior surface point; `object_mask` gates the loss (the reference
        # gathers, which is shape-dynamic).
        surface_points = origin[None, :] + ray_vec * dists[:, None]
        neigh = surface_points + (jax.random.uniform(knormal, surface_points.shape,
                                                     dtype) - 0.5) * 0.01
        pp = jnp.concatenate([surface_points, neigh], axis=0)
        g = nerf_gradient(nerf_params, pp, ncfg)
        normals = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-5)
        normal_diff = safe_norm(
            normals[:n_rays] - normals[n_rays:], axis=-1)

    if rcfg.white_background:
        acc = jnp.sum(weights, axis=-1)
        rgb_values = rgb_values + (1.0 - acc[:, None])

    if eval_ and rcfg.normalise_ray:
        # dist -> depth so predictions are comparable to GT depth (rendering.py:144-148)
        dist_pred = dist_pred / ray_norm
        dists = dists / ray_norm
        d_i_src = d_i_src / ray_norm

    depth_gt = d_i_src
    if rcfg.sample_option == "ndc":
        depth_gt = 1.0 - 1.0 / depth_gt  # rendering.py:158-159

    out = {
        "rgb": rgb_values,
        "z_vals": z_val,
        "alpha": alpha,
        "weights": weights,
        "depth_pred": dist_pred,
        "depth_gt": depth_gt,
        "object_mask": object_mask,
    }
    if normal_diff is not None:
        out["normal"] = normal_diff
    return out
