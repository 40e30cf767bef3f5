"""Tests for the NeRF MLP and the volume renderer: golden formulas, shapes,
gradient flow into pose/distortion parameters."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nope_nerf_tpu.models import (
    NerfConfig, init_nerf_params, nerf_apply, nerf_density, encode_position,
    PoseConfig, init_pose_params, pose_c2w,
    DistortionConfig, init_distortion_params, distortion_scale_shift,
    FocalConfig, init_focal_params, focal_fxfy,
)
from nope_nerf_tpu.ops.render import (
    RenderConfig, render_nope_nerf, sample_uniform, composite, EPSILON,
)
from nope_nerf_tpu.geometry import make_c2w, pixel_grid
from nope_nerf_tpu.geometry.camera import intrinsics_ndc


TINY = NerfConfig(hidden_dim=32)


def test_encode_position_golden():
    """Feature order must be [x, sin(2^0 x), cos(2^0 x), ...] (official_nerf.py:99-119)."""
    x = jnp.asarray([[0.5, -1.0, 2.0]])
    enc = np.asarray(encode_position(x, levels=2))
    assert enc.shape == (1, 3 * 5)
    np.testing.assert_allclose(enc[0, :3], [0.5, -1.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(enc[0, 3:6], np.sin([0.5, -1.0, 2.0]), atol=1e-6)
    np.testing.assert_allclose(enc[0, 6:9], np.cos([0.5, -1.0, 2.0]), atol=1e-6)
    np.testing.assert_allclose(enc[0, 9:12], np.sin([1.0, -2.0, 4.0]), atol=1e-6)
    np.testing.assert_allclose(enc[0, 12:15], np.cos([1.0, -2.0, 4.0]), atol=1e-6)


def test_nerf_apply_shapes_and_ranges():
    params = init_nerf_params(jax.random.key(0), TINY)
    pts = jax.random.normal(jax.random.key(1), (64, 3))
    dirs = jax.random.normal(jax.random.key(2), (64, 3))
    rgb, occ = nerf_apply(params, pts, dirs, TINY)
    assert rgb.shape == (64, 3) and occ.shape == (64, 1)
    assert np.all(np.asarray(rgb) > 0) and np.all(np.asarray(rgb) < 1)  # sigmoid
    # dist_alpha=False -> occupancy in [0, 1)
    assert np.all(np.asarray(occ) >= 0) and np.all(np.asarray(occ) < 1)


def test_nerf_density_matches_apply():
    params = init_nerf_params(jax.random.key(0), TINY)
    pts = jax.random.normal(jax.random.key(1), (16, 3))
    dirs = jnp.ones((16, 3))
    _, occ = nerf_apply(params, pts, dirs, TINY)
    occ2 = nerf_density(params, pts, TINY)
    np.testing.assert_allclose(np.asarray(occ), np.asarray(occ2), atol=1e-6)


def test_dist_alpha_softplus_density():
    cfg = NerfConfig(hidden_dim=32, dist_alpha=True)
    params = init_nerf_params(jax.random.key(0), cfg)
    occ = nerf_density(params, jnp.zeros((4, 3)), cfg)
    assert np.all(np.asarray(occ) > 0)  # softplus is unbounded positive


def test_composite_golden():
    """weights = alpha * cumprod([1, 1-alpha+eps])[:-1] (rendering.py:124-126)."""
    rng = np.random.RandomState(0)
    alpha = rng.uniform(0, 1, (4, 6)).astype(np.float32)
    rgb = rng.rand(4, 6, 3).astype(np.float32)
    z = np.sort(rng.rand(4, 6)).astype(np.float32)
    rgb_out, dist, w = composite(jnp.asarray(rgb), jnp.asarray(alpha), jnp.asarray(z))

    trans = np.cumprod(np.concatenate([np.ones((4, 1)), 1 - alpha + EPSILON], -1), -1)[:, :-1]
    w_want = alpha * trans
    np.testing.assert_allclose(np.asarray(w), w_want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_out), (w_want[..., None] * rgb).sum(-2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dist), (w_want * z).sum(-1), rtol=1e-5)


def test_sample_uniform_no_noise_is_linspace():
    z = np.asarray(sample_uniform(None, 3, 5, (0.01, 10.0), add_noise=False))
    want = 0.01 * (1 - np.linspace(0, 1, 5)) + 10.0 * np.linspace(0, 1, 5)
    np.testing.assert_allclose(z, np.broadcast_to(want, (3, 5)), rtol=1e-6)


def test_sample_uniform_noise_within_bins():
    key = jax.random.key(0)
    z = np.asarray(sample_uniform(key, 100, 16, (0.01, 10.0), add_noise=True))
    base = 0.01 * (1 - np.linspace(0, 1, 16)) + 10.0 * np.linspace(0, 1, 16)
    mid = 0.5 * (base[1:] + base[:-1])
    low = np.concatenate([[base[0]], mid])
    high = np.concatenate([mid, [base[-1]]])
    assert np.all(z >= low - 1e-5) and np.all(z <= high + 1e-5)
    assert np.all(np.diff(z, axis=1) > -1e-4)  # still sorted


def _frame(n_rays=32, seed=0):
    rng = np.random.RandomState(seed)
    K = jnp.asarray(intrinsics_ndc(725.0, 725.0, 64, 48))
    c2w = make_c2w(jnp.asarray(rng.randn(3) * 0.1), jnp.asarray(rng.randn(3) * 0.5))
    world = jnp.linalg.inv(c2w)
    _, pix_all = pixel_grid((48, 64))
    pixels = pix_all[rng.choice(48 * 64, n_rays, replace=False)]
    depth = jnp.asarray(rng.uniform(1.0, 8.0, (n_rays, 1)), jnp.float32)
    return K, world, pixels, depth


def test_render_smoke_and_depth_range():
    params = init_nerf_params(jax.random.key(0), TINY)
    rcfg = RenderConfig(num_points=16, depth_range=(0.01, 10.0))
    K, world, pixels, depth = _frame()
    out = render_nope_nerf(params, pixels, depth, K, world, None,
                           jax.random.key(1), rcfg, TINY, add_noise=True)
    assert out["rgb"].shape == (32, 3)
    assert out["depth_pred"].shape == (32,)
    assert out["z_vals"].shape == (32, 16)
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))
    # expected distance lies within the sampled range (weights sum <= 1)
    assert np.all(np.asarray(out["depth_pred"]) <= 10.0 + 1e-3)
    assert np.all(np.asarray(out["object_mask"]))  # all priors valid


def test_render_depth_gt_is_prior_distance():
    """depth_gt must equal ||prior point - origin|| (rendering.py:53-56), i.e. prior
    depth scaled into distance when rays are normalized."""
    params = init_nerf_params(jax.random.key(0), TINY)
    rcfg = RenderConfig(num_points=8)
    K, world, pixels, depth = _frame()
    out = render_nope_nerf(params, pixels, depth, K, world, None,
                           jax.random.key(1), rcfg, TINY, add_noise=False)
    # eval_: renormalized back to depth -> equals prior depth exactly
    out_eval = render_nope_nerf(params, pixels, depth, K, world, None,
                                None, rcfg, TINY, add_noise=False, eval_=True)
    np.testing.assert_allclose(np.asarray(out_eval["depth_gt"]),
                               np.asarray(depth)[:, 0], rtol=1e-4)
    # train-time depth_gt = distance = depth * ray_norm >= depth
    assert np.all(np.asarray(out["depth_gt"]) >= np.asarray(depth)[:, 0] - 1e-4)


def test_render_zero_depth_masks_out():
    params = init_nerf_params(jax.random.key(0), TINY)
    rcfg = RenderConfig(num_points=8)
    K, world, pixels, depth = _frame()
    depth = depth.at[0].set(0.0)
    out = render_nope_nerf(params, pixels, depth, K, world, None,
                           jax.random.key(1), rcfg, TINY)
    mask = np.asarray(out["object_mask"])
    assert not mask[0] and np.all(mask[1:])


def test_white_background():
    params = init_nerf_params(jax.random.key(0), NerfConfig(hidden_dim=32, white_background=True))
    rcfg = RenderConfig(num_points=8, white_background=True)
    K, world, pixels, depth = _frame()
    out = render_nope_nerf(params, pixels, depth, K, world, None,
                           jax.random.key(1), rcfg, TINY)
    # with random init, occupancies are small -> background pushes rgb toward 1
    assert float(jnp.mean(out["rgb"])) > 0.5


def test_gradients_flow_to_pose_and_distortion():
    """Joint optimization sanity: d(rgb loss)/d(pose r,t) and d/d(distortion) finite
    and nonzero — the core NoPe-NeRF capability (gradients through the renderer into
    poses, BASELINE.json north star)."""
    ncfg = TINY
    params = init_nerf_params(jax.random.key(0), ncfg)
    rcfg = RenderConfig(num_points=8)
    K, _, pixels, depth = _frame()
    pcfg = PoseConfig(num_cams=3)
    dcfg = DistortionConfig(num_cams=3, fix_scaleN=False)
    pose_params = init_pose_params(pcfg)
    pose_params["t"] = pose_params["t"].at[1].set(jnp.asarray([0.1, 0.0, -0.2]))
    dist_params = init_distortion_params(dcfg)
    target = jnp.ones((pixels.shape[0], 3)) * 0.4

    def loss_fn(pose_p, dist_p):
        c2w = pose_c2w(pose_p, 1, pcfg)
        world = jnp.linalg.inv(c2w)
        s, sh = distortion_scale_shift(dist_p, 1, dcfg)
        d = depth * s + sh
        out = render_nope_nerf(params, pixels, d, K, world, None,
                               jax.random.key(2), rcfg, ncfg, add_noise=False)
        rgb_term = jnp.mean((out["rgb"] - target) ** 2)
        depth_term = jnp.mean(jnp.abs(out["depth_pred"] - out["depth_gt"]))
        return rgb_term + 0.04 * depth_term

    g_pose, g_dist = jax.grad(loss_fn, argnums=(0, 1))(pose_params, dist_params)
    for name, g in [("r", g_pose["r"]), ("t", g_pose["t"]),
                    ("scale", g_dist["scale"]), ("shift", g_dist["shift"])]:
        g = np.asarray(g)
        assert np.all(np.isfinite(g)), f"non-finite grad for {name}"
        assert np.abs(g[1]).max() > 0, f"zero grad for {name}"


def test_pose_modules():
    pcfg = PoseConfig(num_cams=4, use_init_c2w=True)
    init = jnp.broadcast_to(jnp.eye(4), (4, 4, 4))
    p = init_pose_params(pcfg, init_c2w=init)
    c2w = pose_c2w(p, 2, pcfg)
    np.testing.assert_allclose(np.asarray(c2w), np.eye(4), atol=1e-6)


def test_focal_modules():
    fcfg = FocalConfig(fx_only=False, order=2)
    p = init_focal_params(fcfg, init_focal=[2.33, 7.71])
    fxfy = np.asarray(focal_fxfy(p, fcfg))
    np.testing.assert_allclose(fxfy, [2.33, 7.71], rtol=1e-5)
    fcfg1 = FocalConfig(fx_only=True, order=1)
    p1 = init_focal_params(fcfg1, init_focal=1.5)
    np.testing.assert_allclose(np.asarray(focal_fxfy(p1, fcfg1)), [1.5, 1.5], rtol=1e-6)


def test_distortion_clamp_and_fixN():
    dcfg = DistortionConfig(num_cams=3, fix_scaleN=True)
    p = init_distortion_params(dcfg)
    p["scale"] = jnp.asarray([[0.001], [0.5], [3.0]])
    s0, _ = distortion_scale_shift(p, 0, dcfg)
    s1, _ = distortion_scale_shift(p, 1, dcfg)
    s2, _ = distortion_scale_shift(p, 2, dcfg)
    assert np.isclose(float(s0[0]), 0.01)   # clamped
    assert np.isclose(float(s1[0]), 0.5)
    assert np.isclose(float(s2[0]), 1.0)    # pinned last frame


def test_ndc_render_path():
    """sample_option='ndc' (rendering.py:169-181): linspace in NDC, negated-dir
    encoding, depth_gt transformed to 1 - 1/d (rendering.py:158-159)."""
    params = init_nerf_params(jax.random.key(0), TINY)
    rcfg = RenderConfig(num_points=8, sample_option="ndc", normalise_ray=False)
    K, world, pixels, depth = _frame()
    out = render_nope_nerf(params, pixels, depth, K, world, None,
                           None, rcfg, TINY, add_noise=False)
    assert out["rgb"].shape == (32, 3)
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))
    # z values are the NDC linspace [0, 1]
    z = np.asarray(out["z_vals"])
    np.testing.assert_allclose(z[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(z[:, -1], 1.0, atol=1e-6)
    # depth_gt = 1 - 1/d of the (depth-normalized) prior distance
    assert np.all(np.asarray(out["depth_gt"]) < 1.0)
