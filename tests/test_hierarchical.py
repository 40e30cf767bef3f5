"""Hierarchical (importance) sampling tests — TPU-build extension (north star)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier
import jax
import jax.numpy as jnp

from nope_nerf_tpu.models.nerf import NerfConfig, init_nerf_params
from nope_nerf_tpu.ops.render import RenderConfig, render_nope_nerf, sample_pdf
from nope_nerf_tpu.geometry import make_c2w, pixel_grid
from nope_nerf_tpu.geometry.camera import intrinsics_ndc


def test_sample_pdf_concentrates_on_peak():
    """With weight mass on one interval, nearly all fine samples land there."""
    n, s = 16, 32
    z = jnp.broadcast_to(jnp.linspace(1.0, 9.0, s), (n, s))
    w = jnp.zeros((n, s)).at[:, 10].set(10.0).at[:, 11].set(10.0)
    out = sample_pdf(jax.random.key(0), z, w, 64)
    out = np.asarray(out)
    lo = float(z[0, 8])
    hi = float(z[0, 13])
    frac_in_peak = ((out >= lo) & (out <= hi)).mean()
    assert frac_in_peak > 0.95
    assert out.shape == (n, 64)


def test_sample_pdf_deterministic_mode():
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 16), (4, 16))
    w = jnp.ones((4, 16))
    a = sample_pdf(None, z, w, 8, deterministic=True)
    b = sample_pdf(None, z, w, 8, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # uniform weights -> roughly uniform coverage
    assert float(a.min()) < 0.15 and float(a.max()) > 0.85


def test_sample_pdf_within_range():
    z = jnp.broadcast_to(jnp.linspace(2.0, 5.0, 24), (8, 24))
    w = jnp.asarray(np.random.RandomState(0).rand(8, 24), jnp.float32)
    out = np.asarray(sample_pdf(jax.random.key(1), z, w, 32))
    assert out.min() >= 2.0 - 1e-5 and out.max() <= 5.0 + 1e-5


def _frame(n_rays=16):
    rng = np.random.RandomState(0)
    K = jnp.asarray(intrinsics_ndc(30.0, 30.0, 32, 24))
    c2w = make_c2w(jnp.asarray(rng.randn(3) * 0.1), jnp.asarray(rng.randn(3) * 0.3))
    world = jnp.linalg.inv(c2w)
    _, pix = pixel_grid((24, 32))
    pixels = pix[rng.choice(24 * 32, n_rays, replace=False)]
    depth = jnp.full((n_rays, 1), 4.0)
    return K, world, pixels, depth


def test_hierarchical_render():
    ncfg = NerfConfig(hidden_dim=32)
    params = init_nerf_params(jax.random.key(0), ncfg)
    K, world, pixels, depth = _frame()
    rcfg = RenderConfig(num_points=16, n_importance=16)
    out = render_nope_nerf(params, pixels, depth, K, world, None,
                           jax.random.key(1), rcfg, ncfg, add_noise=True)
    assert out["rgb"].shape == (16, 3)
    assert out["z_vals"].shape == (16, 32)           # coarse + fine merged
    assert out["alpha"].shape == (16, 32)
    z = np.asarray(out["z_vals"])
    assert np.all(np.diff(z, axis=1) >= -1e-5)       # sorted
    assert np.all(np.isfinite(np.asarray(out["rgb"])))


def test_hierarchical_grads_flow():
    ncfg = NerfConfig(hidden_dim=32)
    params = init_nerf_params(jax.random.key(0), ncfg)
    K, world, pixels, depth = _frame()
    rcfg = RenderConfig(num_points=8, n_importance=8)

    def loss(p):
        out = render_nope_nerf(p, pixels, depth, K, world, None,
                               jax.random.key(1), rcfg, ncfg, add_noise=False)
        return jnp.mean(out["rgb"] ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in leaves)
