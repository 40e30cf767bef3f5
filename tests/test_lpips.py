"""LPIPS (VGG16) architecture parity vs a torch oracle with random weights,
plus the weight-file loading/conversion paths.

The oracle re-implements the upstream `lpips` package's LPIPS(net='vgg')
forward (scaling layer -> VGG16 taps -> unit-normalize -> squared diff ->
1x1 lin -> spatial average -> sum) directly with torch.nn.functional, fed
[0,1]-range images exactly as the reference does (model/eval_images.py:99-101).
Pretrained weights are irrelevant to the math, so random weights prove parity.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from nope_nerf_tpu.evaluation.lpips import (  # noqa: E402
    TAP_CHANNELS,
    VGG16_CONV_IDX,
    convert_torch_lpips,
    load_lpips_params,
    lpips_pair,
)

_CHANNELS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
_POOL_BEFORE = (2, 4, 7, 10)
_TAPS = (1, 3, 6, 9, 12)


def _random_params(rng):
    params = {}
    c_in = 3
    for idx, c_out in zip(VGG16_CONV_IDX, _CHANNELS):
        params[f"features.{idx}.weight"] = (
            rng.standard_normal((c_out, c_in, 3, 3)) / np.sqrt(9 * c_in)
        ).astype(np.float32)
        params[f"features.{idx}.bias"] = (
            0.1 * rng.standard_normal((c_out,))).astype(np.float32)
        c_in = c_out
    for k, c in enumerate(TAP_CHANNELS):
        params[f"lin{k}.weight"] = np.abs(
            rng.standard_normal((1, c, 1, 1))).astype(np.float32)
    return params


def _torch_lpips(params, a, b):
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps(img):
        x = (torch.from_numpy(img).permute(2, 0, 1)[None] - shift) / scale
        feats = []
        for j, idx in enumerate(VGG16_CONV_IDX):
            if j in _POOL_BEFORE:
                x = F.max_pool2d(x, 2, 2)
            x = F.conv2d(x, torch.from_numpy(params[f"features.{idx}.weight"]),
                         torch.from_numpy(params[f"features.{idx}.bias"]),
                         padding=1)
            x = F.relu(x)
            if j in _TAPS:
                feats.append(x)
        return feats

    with torch.no_grad():
        fa, fb = taps(a), taps(b)
        dist = 0.0
        for k, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (xa.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            nb = xb / (xb.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            diff = (na - nb) ** 2
            w = torch.from_numpy(params[f"lin{k}.weight"])
            dist += F.conv2d(diff, w).mean().item()
    return dist


def test_lpips_matches_torch_oracle():
    rng = np.random.default_rng(0)
    params = _random_params(rng)
    a = rng.random((37, 53, 3)).astype(np.float32)   # odd dims exercise pooling
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)

    want = _torch_lpips(params, a, b)
    got = float(lpips_pair({k: jnp.asarray(v) for k, v in params.items()},
                           jnp.asarray(a), jnp.asarray(b)))
    assert want > 0
    assert np.isclose(got, want, rtol=2e-4, atol=1e-6), (got, want)


def test_lpips_identical_images_zero():
    rng = np.random.default_rng(1)
    params = {k: jnp.asarray(v) for k, v in _random_params(rng).items()}
    a = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    assert float(lpips_pair(params, a, a)) == pytest.approx(0.0, abs=1e-9)


def test_weight_loading_npz_and_torch(tmp_path):
    rng = np.random.default_rng(2)
    params = _random_params(rng)

    npz = tmp_path / "lpips.npz"
    np.savez(npz, **params)
    loaded = load_lpips_params(str(npz))
    np.testing.assert_allclose(np.asarray(loaded["lin0.weight"]),
                               params["lin0.weight"])

    # conversion path: torchvision-style vgg sd + lpips-package-style lin sd
    vgg_sd = {k: torch.from_numpy(v) for k, v in params.items()
              if k.startswith("features.")}
    lin_sd = {f"lin{k}.model.1.weight":
              torch.from_numpy(params[f"lin{k}.weight"]) for k in range(5)}
    vgg_pth, lin_pth = tmp_path / "vgg16.pth", tmp_path / "lpips_vgg.pth"
    torch.save(vgg_sd, vgg_pth)
    torch.save(lin_sd, lin_pth)
    merged_npz = tmp_path / "merged.npz"
    convert_torch_lpips(str(vgg_pth), str(lin_pth), str(merged_npz))
    merged = load_lpips_params(str(merged_npz))

    a = rng.random((16, 24, 3)).astype(np.float32)
    b = rng.random((16, 24, 3)).astype(np.float32)
    d1 = float(lpips_pair({k: jnp.asarray(v) for k, v in params.items()},
                          jnp.asarray(a), jnp.asarray(b)))
    d2 = float(lpips_pair(merged, jnp.asarray(a), jnp.asarray(b)))
    assert np.isclose(d1, d2, rtol=1e-6)


def test_missing_weights_rejected(tmp_path):
    rng = np.random.default_rng(3)
    params = _random_params(rng)
    del params["lin3.weight"]
    npz = tmp_path / "broken.npz"
    np.savez(npz, **params)
    with pytest.raises(KeyError):
        load_lpips_params(str(npz))
