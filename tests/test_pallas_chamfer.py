"""Pallas Chamfer kernel vs the XLA-scan reference path (interpret mode)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier
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
    # Both paths pick argmins at fast precision (the XLA path additionally
    # materializes d2 in bf16 — chamfer.py), so near-tied neighbors may differ
    # per point; each returned distance is the exact distance of its pick, and
    # a pick can only lose by the tie gap. Bound the per-point gap loosely and
    # the mean (the loss) tightly.
    np.testing.assert_allclose(got, want, atol=5e-3)
    np.testing.assert_allclose(got.mean(), want.mean(), rtol=2e-5)


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
    # Where both paths matched the same neighbor the gradients agree exactly;
    # at fast-precision argmin ties the matched pair (and so the unit vector)
    # can legitimately differ. Require near-exact agreement outside a small
    # budget of tied points.
    for gp, gr in ((gx_p, gx_r), (gy_p, gy_r)):
        diff = np.abs(np.asarray(gp) - np.asarray(gr)).max(axis=-1)
        flipped = diff > 1e-4
        assert flipped.mean() < 0.02, f"{flipped.sum()} tie flips"
        np.testing.assert_allclose(np.asarray(gp)[~flipped],
                                   np.asarray(gr)[~flipped], atol=1e-4)


def test_bidirectional_kernel_exact_argmins():
    """The fused bidirectional kernel's packed int32 min-argmin must agree
    with exact numpy argmins away from near-ties (the packing keeps ~2^-11
    relative d2 resolution; random clouds have no such ties)."""
    from nope_nerf_tpu.ops.pallas_chamfer import (
        nearest_idx_bidirectional_pallas)

    x, y = _clouds(s=700, d=900, seed=3)
    xn, yn = np.asarray(x), np.asarray(y)
    d2 = ((xn[:, None, :] - yn[None, :, :]) ** 2).sum(-1)
    with pltpu.force_tpu_interpret_mode():
        idx_xy, idx_yx = nearest_idx_bidirectional_pallas(x, y)
    # compare matched distances (indices may differ only on exact ties)
    np.testing.assert_allclose(
        d2[np.arange(700), np.asarray(idx_xy)], d2.min(1), rtol=2e-3)
    np.testing.assert_allclose(
        d2[np.asarray(idx_yx), np.arange(900)], d2.min(0), rtol=2e-3)
    # and on this data the argmins are in fact identical
    assert (np.asarray(idx_xy) == d2.argmin(1)).mean() > 0.995
    assert (np.asarray(idx_yx) == d2.argmin(0)).mean() > 0.995
