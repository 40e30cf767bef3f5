"""Fused Pallas ray-render kernel vs the unfused JAX path (interpret mode).

The fused path (ops/pallas_render.py) must match the unfused
sample->encode->MLP->composite pipeline on every supported flag combination,
both values and gradients (including the ray-input cotangents that carry pose
gradients). The only tolerated deviation is the exp(sum(log)) cumprod
(~1e-6 reassociation error) on top of the shared bf16 matmul noise.
"""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier
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


# ---------------------------------------------------------------------------
# Train-fused single-kernel loss path (render_ray_loss_fused)
# ---------------------------------------------------------------------------


def _train_setup(n_rays=8, **rcfg_kw):
    """A tiny but eligible train-fused workload with a mixed-validity mask."""
    key = jax.random.key(2)
    ncfg = NerfConfig(compute_dtype="bfloat16", use_pallas=True)
    params = init_nerf_params(key, ncfg)
    rcfg = RenderConfig(num_points=128, depth_range=(0.05, 6.0), **rcfg_kw)
    cam = camera_matrix_from_focal(jnp.asarray(1.2), jnp.asarray(1.4))
    world = jnp.eye(4)
    _, pixels = pixel_grid((4, max(4, n_rays)))
    pixels = pixels[:n_rays]
    kd, kr = jax.random.split(jax.random.key(5))
    depth_prior = 2.0 + jax.random.uniform(kd, (n_rays, 1))
    rgb_gt = jax.random.uniform(kr, (n_rays, 3))
    prior_mask = (jnp.arange(n_rays) % 3) != 0        # mixed validity
    return params, ncfg, rcfg, pixels, depth_prior, rgb_gt, prior_mask, cam, world


def _ray_terms_pair(rgb_loss_type, detach_gt=False, **rcfg_kw):
    """(reference, fused) (l_rgb, l_depth, l2, total, grads) via _ray_terms."""
    import nope_nerf_tpu.ops.render as R
    from nope_nerf_tpu.training.trainer import _ray_terms

    (params, ncfg, rcfg, pixels, depth_prior, rgb_gt, prior_mask,
     cam, world) = _train_setup(**rcfg_kw)

    class MC:  # minimal static config view consumed by _ray_terms
        pass

    mc = MC()
    mc.nerf, mc.render = ncfg, rcfg
    mc.detach_gt_depth = detach_gt
    mc.stratified_noise = True
    from nope_nerf_tpu.losses import LossConfig
    mc.loss = LossConfig()
    weights = {"rgb_weight": jnp.asarray(0.7), "depth_weight": jnp.asarray(0.3)}
    key = jax.random.key(9)
    n_total = pixels.shape[0]

    def total_of(disable):
        orig = R.fused_train_eligible
        if disable:
            R.fused_train_eligible = lambda *a: False
        try:
            def f(p):
                l_rgb, l_depth, l2, tot = _ray_terms(
                    p, pixels, depth_prior, rgb_gt, prior_mask, cam, world,
                    None, key, mc, rgb_loss_type, n_total, weights=weights)
                if tot is None:
                    tot = (weights["rgb_weight"] * l_rgb
                           + weights["depth_weight"] * l_depth)
                return tot, (l_rgb, l_depth, l2)
            with pltpu.force_tpu_interpret_mode():
                (tot, mets), grads = jax.value_and_grad(f, has_aux=True)(params)
        finally:
            R.fused_train_eligible = orig
        return tot, mets, grads

    return total_of(True), total_of(False)


def _assert_train_parity(ref, fus, tol=2e-5):
    (t_r, m_r, g_r), (t_f, m_f, g_f) = ref, fus
    np.testing.assert_allclose(float(t_r), float(t_f), rtol=tol, atol=tol)
    for a, b in zip(m_r, m_f):
        np.testing.assert_allclose(float(a), float(b), rtol=tol, atol=tol)
    fr, _ = jax.flatten_util.ravel_pytree(g_r)
    ff, _ = jax.flatten_util.ravel_pytree(g_f)
    scale = float(jnp.max(jnp.abs(fr))) + 1e-12
    np.testing.assert_allclose(np.asarray(ff) / scale, np.asarray(fr) / scale,
                               atol=5e-5)


def test_train_fused_matches_two_kernel_l1():
    ref, fus = _ray_terms_pair("l1")
    _assert_train_parity(ref, fus)


def test_train_fused_matches_two_kernel_l2():
    ref, fus = _ray_terms_pair("l2")
    _assert_train_parity(ref, fus)


def test_train_fused_dist_alpha_white_bg():
    ref, fus = _ray_terms_pair("l2", dist_alpha=True, white_background=True)
    _assert_train_parity(ref, fus)


def test_train_fused_detach_gt_depth():
    ref, fus = _ray_terms_pair("l1", detach_gt=True)
    _assert_train_parity(ref, fus)


def test_train_fused_ineligible_falls_back():
    from nope_nerf_tpu.ops.render import fused_train_eligible
    ncfg = NerfConfig(use_pallas=True)
    assert fused_train_eligible(RenderConfig(num_points=128), ncfg, 16)
    assert not fused_train_eligible(RenderConfig(num_points=128), ncfg, 17)
    assert not fused_train_eligible(RenderConfig(num_points=64), ncfg, 16)
    assert not fused_train_eligible(
        RenderConfig(num_points=128, normal_loss=True), ncfg, 16)
    assert not fused_train_eligible(
        RenderConfig(num_points=128, n_importance=8), ncfg, 16)
    assert not fused_train_eligible(
        RenderConfig(num_points=128), NerfConfig(use_pallas=False), 16)


def test_train_fused_zero_depth_priors_finite_grads():
    """Sparse priors carry EXACT zeros at invalid pixels; the fused path's
    geometry (prior surface distance) must yield finite gradients there
    (safe_norm) and mask those rays out of the depth loss."""
    import nope_nerf_tpu.ops.render as Rmod
    from nope_nerf_tpu.training.trainer import _ray_terms
    from nope_nerf_tpu.losses import LossConfig

    (params, ncfg, rcfg, pixels, depth_prior, rgb_gt, prior_mask,
     cam, world) = _train_setup()
    # exact zeros on the invalid pixels (sparse-depth convention)
    depth_prior = jnp.where(prior_mask[:, None], depth_prior, 0.0)

    class MC:
        pass

    mc = MC()
    mc.nerf, mc.render = ncfg, rcfg
    mc.detach_gt_depth = False
    mc.stratified_noise = True
    mc.loss = LossConfig()
    weights = {"rgb_weight": jnp.asarray(0.7), "depth_weight": jnp.asarray(0.3)}

    def f(p):
        l_rgb, l_depth, l2, tot = _ray_terms(
            p, pixels, depth_prior, rgb_gt, prior_mask, cam, world, None,
            jax.random.key(3), mc, "l1", pixels.shape[0], weights=weights)
        return tot, (l_rgb, l_depth)

    with pltpu.force_tpu_interpret_mode():
        (tot, (l_rgb, l_depth)), grads = jax.value_and_grad(
            f, has_aux=True)(params)
    assert np.isfinite(float(tot)) and np.isfinite(float(l_depth))
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()


def test_train_fused_camera_world_grads_match():
    """Pose/focal learning flows through d(ray table): the fused path's grads
    wrt camera_mat and world_mat must match the two-kernel path (these carry
    the entire pose-optimization signal in the train step)."""
    import nope_nerf_tpu.ops.render as R
    from nope_nerf_tpu.losses import LossConfig
    from nope_nerf_tpu.training.trainer import _ray_terms

    (params, ncfg, rcfg, pixels, depth_prior, rgb_gt, prior_mask,
     cam, world) = _train_setup()
    # a non-trivial world matrix so rotation grads are exercised
    from nope_nerf_tpu.geometry.lie import make_c2w
    world = jnp.linalg.inv(make_c2w(jnp.asarray([0.05, -0.02, 0.03]),
                                    jnp.asarray([0.1, -0.2, 0.3])))

    class MC:
        pass

    mc = MC()
    mc.nerf, mc.render = ncfg, rcfg
    mc.detach_gt_depth = False
    mc.stratified_noise = True
    mc.loss = LossConfig()
    weights = {"rgb_weight": jnp.asarray(0.7), "depth_weight": jnp.asarray(0.3)}

    def total_of(disable):
        orig = R.fused_train_eligible
        if disable:
            R.fused_train_eligible = lambda *a: False
        try:
            def f(cam_w):
                cam_, world_ = cam_w
                l_rgb, l_depth, _, tot = _ray_terms(
                    params, pixels, depth_prior, rgb_gt, prior_mask, cam_,
                    world_, None, jax.random.key(11), mc, "l2",
                    pixels.shape[0], weights=weights)
                if tot is None:
                    tot = (weights["rgb_weight"] * l_rgb
                           + weights["depth_weight"] * l_depth)
                return tot
            with pltpu.force_tpu_interpret_mode():
                return jax.grad(f)((cam, world))
        finally:
            R.fused_train_eligible = orig

    g_ref = total_of(True)
    g_fus = total_of(False)
    for a, b in zip(g_ref, g_fus):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        np.testing.assert_allclose(np.asarray(b) / scale, np.asarray(a) / scale,
                                   atol=5e-5)
        assert float(jnp.max(jnp.abs(a))) > 0  # the signal actually exists


def test_noaux_vjp_gradients_flow():
    """Gradients keep flowing through the noaux custom VJP (eval path used by
    test-time pose optimization; the backward kernel recomputes the forward)."""
    params, cam, world, pixels, depth_prior = _setup()
    ncfg = NerfConfig(compute_dtype="bfloat16", use_pallas=True)
    rcfg = RenderConfig(num_points=128)

    def f(p):
        out = render_nope_nerf(p, pixels, depth_prior, cam, world, None, None,
                               rcfg, ncfg, add_noise=False, eval_=True,
                               need_aux=False)
        return jnp.sum(out["rgb"]) + jnp.sum(out["depth_pred"])

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(f)(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())


def test_lane_scan_helpers_match_cumsum():
    """The composite's f32 Hillis-Steele lane scans (round 5 — they replaced
    an MXU matmul that Mosaic silently truncated to bf16 on hardware) must
    match exclusive cumsum to f32-reassociation accuracy, for both the
    power-of-2 default S and a non-power-of-2 width."""
    from jax.experimental import pallas as pl

    from nope_nerf_tpu.ops.pallas_render import (_lane_prefix_exclusive,
                                                 _lane_suffix_exclusive)

    rng = np.random.RandomState(0)
    for S in (128, 96):
        x = rng.randn(8, S).astype(np.float32)

        def kp(x_ref, o_ref):
            o_ref[:] = _lane_prefix_exclusive(x_ref[:])

        def ks(x_ref, o_ref):
            o_ref[:] = _lane_suffix_exclusive(x_ref[:])

        with pltpu.force_tpu_interpret_mode():
            p = pl.pallas_call(kp, out_shape=jax.ShapeDtypeStruct(
                x.shape, jnp.float32))(x)
            s = pl.pallas_call(ks, out_shape=jax.ShapeDtypeStruct(
                x.shape, jnp.float32))(x)
        pref = np.cumsum(x.astype(np.float64), 1) - x
        suff = np.cumsum(x[:, ::-1].astype(np.float64), 1)[:, ::-1] - x
        np.testing.assert_allclose(np.asarray(p), pref, atol=2e-5)
        np.testing.assert_allclose(np.asarray(s), suff, atol=2e-5)
