"""Pallas Chamfer kernel vs the XLA-scan reference path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from nope_nerf_tpu.ops.chamfer import chamfer_loss, nearest_dists
from nope_nerf_tpu.ops.pallas_chamfer import nearest_dists_pallas


def _clouds(s=700, d=900, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(s, 3), jnp.float32),
            jnp.asarray(rng.randn(d, 3), jnp.float32))


def test_nearest_dists_matches_scan():
    x, y = _clouds()
    want = np.asarray(nearest_dists(x, y, tile=256))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(nearest_dists_pallas(x, y))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_chamfer_pallas_matches():
    x, y = _clouds(seed=1)
    want = float(chamfer_loss(x, y, tile=256))
    with pltpu.force_tpu_interpret_mode():
        got = float(chamfer_loss(x, y, use_pallas=True))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_chamfer_pallas_grads_match():
    x, y = _clouds(s=300, d=400, seed=2)

    def loss_ref(x, y):
        return chamfer_loss(x, y, tile=128)

    def loss_pal(x, y):
        return chamfer_loss(x, y, use_pallas=True)

    gx_r, gy_r = jax.grad(loss_ref, argnums=(0, 1))(x, y)
    with pltpu.force_tpu_interpret_mode():
        gx_p, gy_p = jax.grad(loss_pal, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_r), atol=1e-4)
