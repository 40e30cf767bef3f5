"""SSIM: a 3x3 box-filter loss variant and an 11-tap gaussian eval variant.

Reference counterparts:
- loss variant: `model/losses.py:232-264` (reflection pad 1, AvgPool2d(3,1),
  returns clamp((1-SSIM)/2, 0, 1) as a map). NOTE: the reference feeds (B, H, W, 3)
  tensors into AvgPool2d, which pools over the (W, channel) axes — an inherited
  upstream quirk. Here the filter is applied over the spatial (H, W) axes per channel,
  which is the intended semantics; flagged for the parity record.
- eval variant: `third_party/pytorch_ssim/__init__.py:20-93` (gaussian window 11,
  sigma 1.5, same-padding conv, scalar mean).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _reflect_pad_hw(x: jax.Array, p: int) -> jax.Array:
    """Reflection-pad (H, W, C) spatially by p (torch ReflectionPad2d)."""
    return jnp.pad(x, ((p, p), (p, p), (0, 0)), mode="reflect")


def _box3(x: jax.Array) -> jax.Array:
    """3x3 mean filter, valid conv, per channel. (H+2, W+2, C) -> (H, W, C)."""
    c = x.shape[-1]
    k = jnp.ones((3, 3), x.dtype) / 9.0
    kern = jnp.broadcast_to(k[:, :, None, None], (3, 3, 1, c))
    return jax.lax.conv_general_dilated(
        x[None], kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)[0]


def ssim_loss_map(x: jax.Array, y: jax.Array) -> jax.Array:
    """(H, W, C) pair -> per-pixel dissimilarity map clamp((1-SSIM)/2, 0, 1)."""
    xp, yp = _reflect_pad_hw(x, 1), _reflect_pad_hw(y, 1)
    mu_x, mu_y = _box3(xp), _box3(yp)
    sigma_x = _box3(xp * xp) - mu_x ** 2
    sigma_y = _box3(yp * yp) - mu_y ** 2
    sigma_xy = _box3(xp * yp) - mu_x * mu_y
    n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    d = (mu_x ** 2 + mu_y ** 2 + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1.0 - n / d) / 2.0, 0.0, 1.0)


def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         sigma: float = 1.5) -> jax.Array:
    """Scalar SSIM between two (H, W, C) images — the eval metric.

    Matches `pytorch_ssim.ssim`: separable gaussian window, SAME padding
    (zero-padded borders, like torch conv2d padding=window//2), mean over all pixels.
    """
    c = img1.shape[-1]
    g = _gaussian_window(window_size, sigma)
    win2d = np.outer(g, g)
    kern = jnp.asarray(np.broadcast_to(win2d[:, :, None, None],
                                       (window_size, window_size, 1, c)).copy())
    pad = window_size // 2

    def filt(x):
        # HIGHEST precision: TPU convs default to bf16 multiplies, and the
        # E[x^2]-E[x]^2 variance cancellation breaks (SSIM > 1 artifacts)
        return jax.lax.conv_general_dilated(
            x[None], kern, window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)[0]

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1 = filt(img1 * img1) - mu1_sq
    sigma2 = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu12
    ssim_map = ((2 * mu12 + _C1) * (2 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1 + sigma2 + _C2))
    return jnp.mean(ssim_map)
