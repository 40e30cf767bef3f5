"""Fused Pallas MLP vs the plain-JAX reference path, in interpreter mode on CPU.
Checks forward values and ALL gradient paths (params, pts, ray_d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

from jax.experimental.pallas import tpu as pltpu

from nope_nerf_tpu.models.nerf import NerfConfig, init_nerf_params, nerf_apply
from nope_nerf_tpu.ops.pallas_mlp import nerf_apply_fused, TILE


CFG = NerfConfig(hidden_dim=256, compute_dtype="bfloat16")


@pytest.fixture(scope="module")
def data():
    params = init_nerf_params(jax.random.key(0), CFG)
    pts = jax.random.normal(jax.random.key(1), (TILE * 2, 3)) * 2.0
    dirs = jax.random.normal(jax.random.key(2), (TILE * 2, 3))
    return params, pts, dirs


def test_forward_matches_reference(data):
    params, pts, dirs = data
    rgb_ref, den_ref = nerf_apply(params, pts, dirs, CFG)
    with pltpu.force_tpu_interpret_mode():
        rgb_f, den_f = nerf_apply_fused(params, pts, dirs, CFG)
    assert rgb_f.shape == rgb_ref.shape and den_f.shape == den_ref.shape
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(den_f), np.asarray(den_ref),
                               atol=2e-2, rtol=2e-2)


def test_gradients_match_reference(data):
    params, pts, dirs = data
    # small batch for speed in interpreter mode
    pts, dirs = pts[:TILE], dirs[:TILE]
    tgt_rgb = jnp.full((TILE, 3), 0.5)

    def loss_ref(params, pts, dirs):
        rgb, den = nerf_apply(params, pts, dirs, CFG)
        return jnp.mean((rgb - tgt_rgb) ** 2) + 0.1 * jnp.mean(den)

    def loss_fused(params, pts, dirs):
        rgb, den = nerf_apply_fused(params, pts, dirs, CFG)
        return jnp.mean((rgb - tgt_rgb) ** 2) + 0.1 * jnp.mean(den)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, pts, dirs)
    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(params, pts, dirs)

    # params grads
    for k in g_ref[0]:
        a, b = np.asarray(g_ref[0][k]), np.asarray(g_f[0][k])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-2,
                                   err_msg=f"param grad mismatch: {k}")
    # pts/dirs grads (pose-gradient path!)
    for name, a, b in [("pts", g_ref[1], g_f[1]), ("dirs", g_ref[2], g_f[2])]:
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-2,
                                   err_msg=f"{name} grad mismatch")
        assert np.abs(b).max() > 0, f"{name} grads are zero"


def test_nonmultiple_tile_padding(data):
    params, pts, dirs = data
    n = TILE + 37
    with pltpu.force_tpu_interpret_mode():
        rgb, den = nerf_apply_fused(params, pts[:n], dirs[:n], CFG)
    assert rgb.shape == (n, 3) and den.shape == (n, 1)
    rgb_ref, _ = nerf_apply(params, pts[:n], dirs[:n], CFG)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=2e-2)
