"""Parity tests for image ops against torch (the reference's substrate), and golden
checks for the Chamfer loss. torch runs CPU-only here, as the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from nope_nerf_tpu.ops import (  # noqa: E402
    grid_sample, resize_nearest, resize_bilinear, resize_area,
    chamfer_loss, nearest_dists, ssim_eval, ssim_loss_map,
)


def _rand_img(h, w, c, seed=0):
    return np.random.RandomState(seed).rand(h, w, c).astype(np.float32)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_matches_torch(mode, align_corners):
    img = _rand_img(13, 17, 3)
    pts = np.random.RandomState(1).uniform(-1.2, 1.2, (50, 2)).astype(np.float32)

    got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(pts), mode=mode,
                                 align_corners=align_corners))

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]          # (1, C, H, W)
    t_grid = torch.from_numpy(pts)[None, None]                     # (1, 1, N, 2)
    want = F.grid_sample(t_img, t_grid, mode=mode, align_corners=align_corners,
                         padding_mode="zeros")[0, :, 0].T.numpy()  # (N, C)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("size", [(5, 7), (9, 16), (13, 17)])
def test_resize_nearest_matches_torch(size):
    img = _rand_img(13, 17, 2, seed=2)
    got = np.asarray(resize_nearest(jnp.asarray(img), size))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    want = F.interpolate(t, size, mode="nearest")[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("size", [(5, 7), (26, 34), (13, 17)])
def test_resize_bilinear_matches_torch(size):
    img = _rand_img(13, 17, 3, seed=3)
    got = np.asarray(resize_bilinear(jnp.asarray(img), size))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    want = F.interpolate(t, size, mode="bilinear",
                         align_corners=False)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("size", [(5, 7), (6, 8), (13, 17)])
def test_resize_area_matches_torch(size):
    img = _rand_img(12, 16, 1, seed=4)
    got = np.asarray(resize_area(jnp.asarray(img), size))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    want = F.interpolate(t, size, mode="area")[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nearest_dists_brute_force():
    rng = np.random.RandomState(5)
    x = rng.randn(37, 3).astype(np.float32)
    y = rng.randn(53, 3).astype(np.float32)
    got = np.asarray(nearest_dists(jnp.asarray(x), jnp.asarray(y), tile=16))
    want = np.min(np.linalg.norm(x[:, None] - y[None], axis=-1), axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_chamfer_matches_reference_formula():
    """Reference comp_point_point_error (losses.py:129-150): argmin of distances, then
    mean euclidean distance of matched pairs, both directions summed."""
    rng = np.random.RandomState(6)
    x = rng.randn(40, 3).astype(np.float32)
    y = rng.randn(30, 3).astype(np.float32)
    got = float(chamfer_loss(jnp.asarray(x), jnp.asarray(y), tile=8))
    d_xy = np.linalg.norm(x[:, None] - y[None], axis=-1)
    want = d_xy.min(1).mean() + d_xy.min(0).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ssim_eval_matches_pytorch_ssim_formula():
    """Golden reimplementation of third_party/pytorch_ssim in torch ops."""
    img1 = _rand_img(32, 48, 3, seed=7)
    img2 = np.clip(img1 + 0.05 * np.random.RandomState(8).randn(32, 48, 3), 0, 1).astype(np.float32)
    got = float(ssim_eval(jnp.asarray(img1), jnp.asarray(img2)))

    # torch oracle: gaussian window conv, same as pytorch_ssim/__init__.py:20-93
    window_size, sigma = 11, 1.5
    g = torch.exp(-((torch.arange(window_size).float() - window_size // 2) ** 2)
                  / (2 * sigma ** 2))
    g = (g / g.sum())
    win = (g[:, None] @ g[None, :])[None, None].expand(3, 1, -1, -1).contiguous()
    t1 = torch.from_numpy(img1).permute(2, 0, 1)[None]
    t2 = torch.from_numpy(img2).permute(2, 0, 1)[None]

    def filt(x):
        return F.conv2d(x, win, padding=window_size // 2, groups=3)

    mu1, mu2 = filt(t1), filt(t2)
    s1 = filt(t1 * t1) - mu1 ** 2
    s2 = filt(t2 * t2) - mu2 ** 2
    s12 = filt(t1 * t2) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / ((mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))
    want = float(m.mean())
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ssim_loss_map_properties():
    img = _rand_img(16, 20, 3, seed=9)
    m = np.asarray(ssim_loss_map(jnp.asarray(img), jnp.asarray(img)))
    assert m.shape == (16, 20, 3)
    np.testing.assert_allclose(m, 0.0, atol=1e-6)  # identical images -> 0 loss
    other = _rand_img(16, 20, 3, seed=10)
    m2 = np.asarray(ssim_loss_map(jnp.asarray(img), jnp.asarray(other)))
    assert np.all(m2 >= 0) and np.all(m2 <= 1) and m2.mean() > 0.01


def test_chamfer_wide_tile_fallback_matches_packed():
    """chamfer_tile up to 2048 is a documented knob (training/state.py): tiles
    wider than the packed path's 9-bit index budget must take the plain
    three-reduce path and return identical indices/loss."""
    from nope_nerf_tpu.ops.chamfer import _nearest_idx_bidirectional

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(700, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(650, 3).astype(np.float32))
    ixy_p, iyx_p = _nearest_idx_bidirectional(x, y, 256)     # packed
    ixy_w, iyx_w = _nearest_idx_bidirectional(x, y, 1024)    # fallback
    np.testing.assert_array_equal(np.asarray(ixy_p), np.asarray(ixy_w))
    np.testing.assert_array_equal(np.asarray(iyx_p), np.asarray(iyx_w))
