"""Loss-term golden tests against the reference formulas (model/losses.py),
with torch as oracle where reductions are subtle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from nope_nerf_tpu.losses import (  # noqa: E402
    LossConfig, compute_losses, rgb_loss, depth_loss_l1, depth_loss_invariant,
    weight_dist_loss, t_cycle_loss, masked_mean, masked_median, rgb_s_loss,
    depth_consistency_loss,
)


def test_rgb_loss_sum_normalized():
    """get_rgb_full_loss (losses.py:28-33): reduction='sum' / n_rays."""
    rng = np.random.RandomState(0)
    pred = rng.rand(100, 3).astype(np.float32)
    gt = rng.rand(100, 3).astype(np.float32)
    got_l1 = float(rgb_loss(jnp.asarray(pred), jnp.asarray(gt), "l1"))
    got_l2 = float(rgb_loss(jnp.asarray(pred), jnp.asarray(gt), "l2"))
    np.testing.assert_allclose(got_l1, np.abs(pred - gt).sum() / 100, rtol=1e-5)
    np.testing.assert_allclose(got_l2, ((pred - gt) ** 2).sum() / 100, rtol=1e-5)


def test_depth_l1_masked_equals_gather():
    rng = np.random.RandomState(1)
    pred = rng.rand(64).astype(np.float32) * 5
    gt = rng.rand(64).astype(np.float32) * 5
    mask = rng.rand(64) > 0.3
    got = float(depth_loss_l1(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    want = np.abs(pred[mask] - gt[mask]).sum() / mask.sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_median_matches_torch():
    """torch.median returns the lower of two middles for even counts."""
    rng = np.random.RandomState(2)
    for n in [7, 8, 31, 32]:
        x = rng.rand(n).astype(np.float32)
        mask = np.ones(n, bool)
        got = float(masked_median(jnp.asarray(x), jnp.asarray(mask)))
        want = float(torch.median(torch.from_numpy(x)))
        np.testing.assert_allclose(got, want, rtol=1e-6)
    # with a partial mask: equals torch.median of the gathered subset
    x = rng.rand(40).astype(np.float32)
    mask = rng.rand(40) > 0.4
    got = float(masked_median(jnp.asarray(x), jnp.asarray(mask)))
    want = float(torch.median(torch.from_numpy(x[mask])))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_depth_invariant_matches_golden():
    """depth_loss_dpt (losses.py:35-58): median/MAD normalize then MSE."""
    rng = np.random.RandomState(3)
    pred = (rng.rand(55) * 4 + 1).astype(np.float32)
    gt = (rng.rand(55) * 4 + 1).astype(np.float32)
    mask = np.ones(55, bool)
    got = float(depth_loss_invariant(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))

    tp = torch.from_numpy(pred)
    tg = torch.from_numpy(gt)
    t_pred = torch.median(tp)
    s_pred = torch.mean(torch.abs(tp - t_pred))
    t_gt = torch.median(tg)
    s_gt = torch.mean(torch.abs(tg - t_gt))
    want = float(torch.nn.functional.mse_loss((tp - t_pred) / s_pred, (tg - t_gt) / s_gt))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_weight_dist_loss_golden():
    """get_weight_dist_loss (losses.py:105-114)."""
    rng = np.random.RandomState(4)
    t = rng.randn(10, 3).astype(np.float32)
    got1, got2 = weight_dist_loss(jnp.asarray(t))

    tt = torch.from_numpy(t)
    dist = tt - tt.roll(shifts=1, dims=0)
    dist = dist[1:].norm(dim=1)
    dist_diff = (dist - dist.roll(shifts=1))[1:]
    np.testing.assert_allclose(float(got1), float(dist.mean()), rtol=1e-5)
    np.testing.assert_allclose(float(got2), float(dist_diff.pow(2).mean()), rtol=1e-5)


def test_t_cycle_loss_golden():
    rng = np.random.RandomState(5)
    A = np.eye(4, dtype=np.float32)
    A[:3, :3] += rng.randn(3, 3) * 0.05
    A[:3, 3] = rng.randn(3)
    B = np.eye(4, dtype=np.float32)
    B[:3, 3] = rng.randn(3)
    got = float(t_cycle_loss(jnp.asarray(A), jnp.asarray(B)))
    want = np.linalg.norm(np.eye(4) - np.linalg.inv(B) @ A)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_rgb_s_loss_mean_on_mask():
    """mean_on_mask expands the (H,W,1) mask across channels (losses.py:79-87)."""
    rng = np.random.RandomState(6)
    a = rng.rand(8, 9, 3).astype(np.float32)
    b = rng.rand(8, 9, 3).astype(np.float32)
    valid = (rng.rand(8, 9, 1) > 0.5).astype(np.float32)
    got = float(rgb_s_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid), False))
    diff = np.clip(np.abs(a - b), 0, 1)
    m = np.broadcast_to(valid, diff.shape).astype(bool)
    want = diff[m].sum() / m.sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_depth_consistency_golden():
    rng = np.random.RandomState(7)
    d1p = rng.rand(50).astype(np.float32)
    d2 = rng.rand(50).astype(np.float32)
    got = float(depth_consistency_loss(jnp.asarray(d1p), jnp.asarray(d2)))
    np.testing.assert_allclose(got, np.abs(d1p - d2).sum() / 50, rtol=1e-5)


@pytest.mark.slow
def test_compute_losses_weighted_total():
    rng = np.random.RandomState(8)
    n = 64
    cfg = LossConfig(use_rgb=True, use_depth=True, use_dist=True, use_pc=True,
                     use_rgb_s=True, use_depth_consistency=True, use_t_cycle=True)
    weights = {k: jnp.asarray(v) for k, v in {
        "rgb_weight": 1.0, "depth_weight": 0.04,
        "weight_dist_1st_loss": 0.1, "weight_dist_2nd_loss": 0.2,
        "pc_weight": 1.0, "rgb_s_weight": 1.0,
        "depth_consistency_weight": 0.5, "t_cycle_weight": 0.3}.items()}
    out = compute_losses(
        cfg, weights,
        rgb_pred=jnp.asarray(rng.rand(n, 3), jnp.float32),
        rgb_gt=jnp.asarray(rng.rand(n, 3), jnp.float32),
        rgb_loss_type="l1",
        depth_pred=jnp.asarray(rng.rand(n), jnp.float32),
        depth_gt=jnp.asarray(rng.rand(n), jnp.float32),
        depth_mask=jnp.ones(n, bool),
        t_list=jnp.asarray(rng.randn(6, 3), jnp.float32),
        pc_x=jnp.asarray(rng.randn(30, 3), jnp.float32),
        pc_y=jnp.asarray(rng.randn(25, 3), jnp.float32),
        rgb_pc1=jnp.asarray(rng.rand(8, 9, 3), jnp.float32),
        rgb_pc1_proj=jnp.asarray(rng.rand(8, 9, 3), jnp.float32),
        valid_points=jnp.ones((8, 9, 1), jnp.float32),
        d1_proj=jnp.asarray(rng.rand(40), jnp.float32),
        d2=jnp.asarray(rng.rand(40), jnp.float32),
        rt_12=jnp.eye(4), rt_12_gt=jnp.eye(4),
        chamfer_tile=16,
    )
    total = sum(float(weights[w]) * float(out[k]) for w, k in [
        ("rgb_weight", "loss_rgb"), ("depth_weight", "loss_depth"),
        ("weight_dist_1st_loss", "loss_dist_1st"),
        ("weight_dist_2nd_loss", "loss_dist_2nd"),
        ("pc_weight", "loss_pc"), ("rgb_s_weight", "loss_rgb_s"),
        ("depth_consistency_weight", "loss_depth_consistency"),
        ("t_cycle_weight", "loss_t_cycle")])
    np.testing.assert_allclose(float(out["loss"]), total, rtol=1e-5)
    assert float(out["loss_t_cycle"]) < 1e-6  # identity transforms
    assert np.isfinite(float(out["l2_mean"]))


def test_empty_mask_returns_zero():
    got = float(masked_mean(jnp.ones(10), jnp.zeros(10, bool)))
    assert got == 0.0


def test_safe_norm_zero_gradient():
    """Gradients at exact zeros must be 0, not NaN — one coincident Chamfer
    pair otherwise poisons the whole pose gradient (observed on V-KITTI-format
    data with identity-initialized poses)."""
    from nope_nerf_tpu.utils.safemath import safe_norm
    from nope_nerf_tpu.ops.chamfer import chamfer_loss

    x = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, 2.0]])
    np.testing.assert_allclose(np.asarray(safe_norm(x)), [0.0, 3.0])
    g = jax.grad(lambda x: jnp.sum(safe_norm(x)))(x)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g[0]), 0.0)

    # Chamfer with EXACT duplicate points across the clouds: finite value+grads
    a = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    b = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    val, grads = jax.value_and_grad(chamfer_loss, argnums=(0, 1))(a, b)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
