"""Fused Pallas ray-render kernel vs the unfused JAX path (interpret mode).

The fused path (ops/pallas_render.py) must match the unfused
sample->encode->MLP->composite pipeline on every supported flag combination,
both values and gradients (including the ray-input cotangents that carry pose
gradients). The only tolerated deviation is the exp(sum(log)) cumprod
(~1e-6 reassociation error) on top of the shared bf16 matmul noise.
"""

import dataclasses

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nope_nerf_tpu.geometry.camera import camera_matrix_from_focal, pixel_grid
from nope_nerf_tpu.models.nerf import NerfConfig, init_nerf_params
from nope_nerf_tpu.ops.render import RenderConfig, render_nope_nerf

N_RAYS = 8  # one forward tile


def _setup():
    key = jax.random.key(0)
    ncfg_plain = NerfConfig(compute_dtype="bfloat16", use_pallas=False)
    params = init_nerf_params(key, ncfg_plain)
    cam = camera_matrix_from_focal(jnp.asarray(1.2), jnp.asarray(1.4))
    world = jnp.eye(4)
    _, pix_all = pixel_grid((4, 4))
    pixels = pix_all[:N_RAYS]
    depth_prior = jax.random.uniform(key, (N_RAYS, 1)) * 3 + 1
    return params, cam, world, pixels, depth_prior


def _run(params, cam, world, pixels, depth_prior, ncfg, rcfg):
    return render_nope_nerf(params, pixels, depth_prior, cam, world, None,
                            jax.random.key(7), rcfg, ncfg, add_noise=True)


def test_fused_render_matches_unfused():
    params, cam, world, pixels, depth_prior = _setup()
    for dist_alpha in (False, True):
        for occ in ("softplus", "relu"):
            for sample_option in ("uniform", "ndc"):
                rcfg = RenderConfig(num_points=128, dist_alpha=dist_alpha,
                                    sample_option=sample_option)
                nc_x = NerfConfig(compute_dtype="bfloat16", use_pallas=False,
                                  occ_activation=occ)
                nc_p = dataclasses.replace(nc_x, use_pallas=True)
                ref = _run(params, cam, world, pixels, depth_prior, nc_x, rcfg)
                with pltpu.force_tpu_interpret_mode():
                    got = _run(params, cam, world, pixels, depth_prior, nc_p,
                               rcfg)
                for k in ("rgb", "depth_pred", "weights", "alpha"):
                    r, g = np.asarray(ref[k]), np.asarray(got[k])
                    scale = max(1e-3, float(np.max(np.abs(r))))
                    assert np.max(np.abs(r - g)) < 2e-3 * scale, (
                        f"{k} mismatch at dist_alpha={dist_alpha} occ={occ} "
                        f"sample={sample_option}")


def test_fused_render_grads_match():
    params, cam, world, pixels, depth_prior = _setup()
    rcfg = RenderConfig(num_points=128)

    def loss_fn(p, px, ncfg):
        out = render_nope_nerf(p, px, depth_prior, cam, world, None,
                               jax.random.key(3), rcfg, ncfg)
        # touch every output so all four kernel cotangent paths are exercised
        return (jnp.sum(out["rgb"] ** 2) + jnp.sum(out["depth_pred"] ** 2)
                + jnp.sum(out["weights"][:, ::7] ** 2)
                + jnp.sum(out["alpha"][:, 5]))

    nc_x = NerfConfig(compute_dtype="bfloat16", use_pallas=False)
    nc_p = NerfConfig(compute_dtype="bfloat16", use_pallas=True)
    # grads wrt params AND pixels: the pixel path goes through the ray table
    # cotangents (drays) — this is where pose gradients flow in training.
    g_ref = jax.grad(loss_fn, argnums=(0, 1))(params, pixels, nc_x)
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_fn, argnums=(0, 1))(params, pixels, nc_p)

    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_g, _ = jax.flatten_util.ravel_pytree(g_got)
    rel = np.max(np.abs(np.asarray(flat_r) - np.asarray(flat_g))) / (
        np.max(np.abs(np.asarray(flat_r))) + 1e-9)
    assert rel < 5e-3, f"grad rel err {rel}"
