"""Unit tests for L0 geometry against golden numpy implementations of the reference
formulas (model/common.py). These lock down the coordinate conventions — the #1 parity
risk called out in SURVEY.md §7."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nope_nerf_tpu.geometry import (
    vec2skew, exp_so3, make_c2w, log_so3,
    pixel_grid, transform_to_world, origin_to_world, image_points_to_world,
    project_to_cam, rays_from_pixels, get_ndc_rays_fxfy,
)
from nope_nerf_tpu.geometry.camera import intrinsics_ndc, reprojection


def golden_exp(r):
    """Rodrigues formula exactly as model/common.py:290-299."""
    rx, ry, rz = r
    skew = np.array([[0, -rz, ry], [rz, 0, -rx], [-ry, rx, 0]], np.float64)
    n = np.linalg.norm(r) + 1e-15
    return np.eye(3) + (np.sin(n) / n) * skew + ((1 - np.cos(n)) / n**2) * (skew @ skew)


def test_exp_so3_matches_golden():
    rng = np.random.RandomState(0)
    for _ in range(10):
        r = rng.randn(3).astype(np.float32)
        got = np.asarray(exp_so3(jnp.asarray(r)))
        want = golden_exp(r.astype(np.float64))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_exp_so3_identity_at_zero():
    R = np.asarray(exp_so3(jnp.zeros(3)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
    # gradient must be finite at 0 (the 1e-15 shift)
    g = jax.grad(lambda r: jnp.sum(exp_so3(r)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_exp_so3_orthonormal():
    r = jnp.asarray([0.3, -0.2, 0.9])
    R = exp_so3(r)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
    assert np.isclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_log_exp_roundtrip():
    rng = np.random.RandomState(1)
    r = rng.randn(5, 3).astype(np.float32) * 0.5
    R = exp_so3(jnp.asarray(r))
    r2 = np.asarray(log_so3(R))
    np.testing.assert_allclose(r2, r, atol=1e-4)


def test_make_c2w_structure():
    r = jnp.asarray([0.1, 0.2, 0.3])
    t = jnp.asarray([1.0, -2.0, 3.0])
    c2w = np.asarray(make_c2w(r, t))
    np.testing.assert_allclose(c2w[:3, :3], golden_exp(np.asarray(r, np.float64)), atol=1e-5)
    np.testing.assert_allclose(c2w[:3, 3], np.asarray(t), atol=1e-6)
    np.testing.assert_allclose(c2w[3], [0, 0, 0, 1], atol=0)


def test_pixel_grid_convention():
    """arange_pixels (common.py:13-40): x fastest, scaled to [-1,1] with (w-1)/(h-1)."""
    loc, scaled = pixel_grid((3, 5))
    loc, scaled = np.asarray(loc), np.asarray(scaled)
    assert loc.shape == (15, 2) and scaled.shape == (15, 2)
    # first row runs along x
    np.testing.assert_array_equal(loc[:5, 0], np.arange(5))
    np.testing.assert_array_equal(loc[:5, 1], np.zeros(5))
    np.testing.assert_allclose(scaled[0], [-1.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(scaled[4], [1.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(scaled[14], [1.0, 1.0], atol=1e-6)
    # x step = 2/(w-1)
    np.testing.assert_allclose(scaled[1, 0] - scaled[0, 0], 2 / 4, atol=1e-6)


def golden_transform_to_world(pixels, depth, K, world, scale):
    """transform_to_world (common.py:112-160) in numpy."""
    n = pixels.shape[0]
    hom = np.concatenate([pixels, np.ones((n, 2))], -1).T  # (4, N)
    hom[:3] *= depth.reshape(1, -1)
    P = np.linalg.inv(scale) @ np.linalg.inv(world) @ np.linalg.inv(K)
    return (P @ hom)[:3].T


def _example_frame():
    rng = np.random.RandomState(2)
    K = np.asarray(intrinsics_ndc(725.0, 725.0, 621, 188))
    c2w = np.asarray(make_c2w(jnp.asarray(rng.randn(3) * 0.2),
                              jnp.asarray(rng.randn(3))))
    world = np.linalg.inv(c2w).astype(np.float32)
    return K.astype(np.float32), world


def test_transform_to_world_matches_golden():
    K, world = _example_frame()
    rng = np.random.RandomState(3)
    pixels = rng.uniform(-1, 1, (17, 2)).astype(np.float32)
    depth = rng.uniform(0.5, 5.0, (17, 1)).astype(np.float32)
    got = np.asarray(transform_to_world(jnp.asarray(pixels), jnp.asarray(depth),
                                        jnp.asarray(K), jnp.asarray(world)))
    want = golden_transform_to_world(pixels.astype(np.float64),
                                     depth.astype(np.float64),
                                     K.astype(np.float64), world.astype(np.float64),
                                     np.eye(4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_origin_is_camera_center():
    K, world = _example_frame()
    origin = np.asarray(origin_to_world(jnp.asarray(K), jnp.asarray(world)))
    c2w = np.linalg.inv(world)
    np.testing.assert_allclose(origin, c2w[:3, 3], atol=1e-4)


def test_rays_consistent_with_image_points():
    K, world = _example_frame()
    pixels = jnp.asarray(np.random.RandomState(4).uniform(-1, 1, (9, 2)), jnp.float32)
    origin, ray, norm = rays_from_pixels(pixels, jnp.asarray(K), jnp.asarray(world),
                                         normalize=False)
    pw = image_points_to_world(pixels, jnp.asarray(K), jnp.asarray(world))
    np.testing.assert_allclose(np.asarray(pw - origin), np.asarray(ray), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(ray, axis=-1)),
                               np.asarray(norm), atol=1e-4)


def test_project_to_cam_roundtrip():
    """Lift pixels to world at depth d, transform to camera frame, project: must
    recover the pixels (and be valid)."""
    K, world = _example_frame()
    rng = np.random.RandomState(5)
    pixels = rng.uniform(-0.9, 0.9, (11, 2)).astype(np.float32)
    depth = rng.uniform(1.0, 4.0, (11, 1)).astype(np.float32)
    # camera-space points: pixels * d via inv(K) only
    pw = transform_to_world(jnp.asarray(pixels), jnp.asarray(depth), jnp.asarray(K),
                            jnp.eye(4))
    xy, valid = project_to_cam(pw, jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(xy), pixels, atol=1e-4)
    assert bool(np.all(np.asarray(valid)))


def test_reprojection_identity():
    """Identity relative pose reprojects pixels onto themselves."""
    K, world = _example_frame()
    rng = np.random.RandomState(6)
    pixels = rng.uniform(-0.9, 0.9, (7, 2)).astype(np.float32)
    depth = rng.uniform(1.0, 4.0, (7,)).astype(np.float32)
    xy, valid = reprojection(jnp.asarray(pixels), jnp.asarray(depth),
                             jnp.asarray(world), jnp.asarray(world), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(xy), pixels, atol=1e-3)


def test_ndc_rays_match_golden():
    """get_ndc_rays_fxfy (common.py:632-675) golden check: o2+d2 = 1 and near-plane
    shift."""
    rng = np.random.RandomState(7)
    rays_o = jnp.asarray(rng.randn(5, 3) + [0, 0, -4], jnp.float32)
    rays_d = jnp.asarray(rng.randn(5, 3) * 0.1 + [0, 0, 1], jnp.float32)
    fxfy = jnp.asarray([1.2, -1.5])
    o, d = get_ndc_rays_fxfy(fxfy, 1.0, rays_o, rays_d)
    np.testing.assert_allclose(np.asarray(o[:, 2] + d[:, 2]), 1.0, atol=1e-5)


def test_rigid_and_diag_inverse_match_lu():
    """Closed-form pose/K inverses used in the jitted step must agree with the
    general inverse on their respective matrix classes."""
    from scipy.spatial.transform import Rotation
    from nope_nerf_tpu.geometry.camera import (diag4_inverse,
                                               intrinsics_ndc,
                                               rigid_inverse)

    rng = np.random.RandomState(5)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.random(random_state=1).as_matrix()
    T[:3, 3] = rng.randn(3)
    got = np.asarray(rigid_inverse(jnp.asarray(T)))
    np.testing.assert_allclose(got, np.linalg.inv(T), atol=2e-6)
    # product of rigids stays rigid — the trainer inverts those too
    T2 = T @ np.roll(T, 1, axis=0) * 0 + T  # keep simple: compose with itself
    T2 = T @ np.linalg.inv(T)
    np.testing.assert_allclose(np.asarray(rigid_inverse(jnp.asarray(T @ T))),
                               np.linalg.inv(T @ T), atol=2e-6)

    K = intrinsics_ndc(350.0, 340.0, 640, 480)
    np.testing.assert_allclose(np.asarray(diag4_inverse(K)),
                               np.linalg.inv(np.asarray(K)), atol=1e-7)


def test_rigid_inverse_gradients_match_lu_through_pose_params():
    """rigid_inverse and linalg.inv agree as FUNCTIONS on the rigid manifold,
    so their directional derivatives along any tangent direction agree — and
    every gradient in the trainer reaches an inverse THROUGH the se(3)
    parametrization (params -> exp-map c2w -> inverse), i.e. only along
    tangent directions. Raw 4x4 matrix cotangents legitimately differ (the
    two functions extend differently off the manifold); what must match is
    d loss / d (r, t)."""
    from nope_nerf_tpu.geometry.camera import rigid_inverse
    from nope_nerf_tpu.geometry.lie import make_c2w

    r = jnp.asarray([0.3, -0.2, 0.5])
    t = jnp.asarray([0.3, -1.2, 0.7])

    def loss(inv_fn, r, t):
        M = inv_fn(make_c2w(r, t))
        return jnp.sum(jnp.sin(M) * jnp.arange(16.0).reshape(4, 4))

    gr_a, gt_a = jax.grad(lambda r, t: loss(rigid_inverse, r, t),
                          argnums=(0, 1))(r, t)
    gr_b, gt_b = jax.grad(lambda r, t: loss(jnp.linalg.inv, r, t),
                          argnums=(0, 1))(r, t)
    np.testing.assert_allclose(np.asarray(gr_a), np.asarray(gr_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt_a), np.asarray(gt_b), atol=1e-5)
