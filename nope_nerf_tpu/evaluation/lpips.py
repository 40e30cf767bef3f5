"""Pure-JAX LPIPS (VGG16 backbone) — the reference's perceptual image metric.

Capability parity with `lpips_lib.LPIPS(net='vgg')` as the reference constructs
it (`evaluation/eval.py:166`) and calls it (`model/eval_images.py:99-101`).
Architecture (upstream `lpips` package, version 0.1):

  1. ScalingLayer: x -> (x - shift) / scale with the package's constants.
     NOTE the reference feeds [0,1]-range images WITHOUT lpips' normalize=True
     flag, so the scaling layer sees [0,1] (not [-1,1]); we replicate that
     convention exactly.
  2. VGG16 feature stack, tapped at relu1_2 / relu2_2 / relu3_3 / relu4_3 /
     relu5_3 (channels 64/128/256/512/512).
  3. Per tap: unit-normalize along channels (eps 1e-10), squared difference,
     learned non-negative 1x1 linear head, spatial average.
  4. Sum over the 5 taps.

Pretrained weights cannot ship with this repo (no network egress): supply them
at eval time via `extract_images.lpips_weights` in the config — either

  (a) an .npz produced by `convert_torch_lpips(vgg16.pth, lpips_vgg.pth, out)`
      from the torchvision VGG16 state dict + the lpips package's lin weights, or
  (b) a torch .pt/.pth file holding one merged state dict with the same keys
      (`features.<i>.weight/bias` + `lin<k>.weight`).

Without weights the metric is reported as None (PARITY.md deviation 2).
The math is verified against a torch oracle with random weights in
tests/test_lpips.py — correctness does not depend on the pretrained values.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

# torchvision `features` indices of the 13 VGG16 convolutions.
VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
# positions (in conv order) preceded by a 2x2/2 max-pool
_POOL_BEFORE = (2, 4, 7, 10)
# positions (in conv order) whose relu output is an LPIPS tap
_TAPS = (1, 3, 6, 9, 12)
TAP_CHANNELS = (64, 128, 256, 512, 512)

# lpips.ScalingLayer constants (lpips/lpips.py).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32).reshape(1, 3, 1, 1)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32).reshape(1, 3, 1, 1)


def _conv3x3(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b.reshape(1, -1, 1, 1)


def _maxpool2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 2, 2), window_strides=(1, 1, 2, 2),
        padding="VALID")


def _vgg_taps(params: Dict[str, jax.Array], x: jax.Array) -> List[jax.Array]:
    feats = []
    for j, idx in enumerate(VGG16_CONV_IDX):
        if j in _POOL_BEFORE:
            x = _maxpool2(x)
        x = _conv3x3(x, params[f"features.{idx}.weight"],
                     params[f"features.{idx}.bias"])
        x = jnp.maximum(x, 0.0)
        if j in _TAPS:
            feats.append(x)
    return feats


@functools.partial(jax.jit, static_argnames=())
def lpips_pair(params: Dict[str, jax.Array], img_a: jax.Array,
               img_b: jax.Array) -> jax.Array:
    """LPIPS distance between two (H, W, 3) images in [0,1] (the reference's
    input convention, model/eval_images.py:99-101). Returns a scalar."""

    def prep(img):
        x = jnp.transpose(img.astype(jnp.float32), (2, 0, 1))[None]
        return (x - _SHIFT) / _SCALE

    fa = _vgg_taps(params, prep(img_a))
    fb = _vgg_taps(params, prep(img_b))
    dist = jnp.asarray(0.0, jnp.float32)
    for k, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / (jnp.sqrt(jnp.sum(xa * xa, axis=1, keepdims=True)) + 1e-10)
        nb = xb / (jnp.sqrt(jnp.sum(xb * xb, axis=1, keepdims=True)) + 1e-10)
        diff = (na - nb) ** 2                                   # (1,C,H,W)
        w = params[f"lin{k}.weight"].reshape(1, -1, 1, 1)        # (1,C,1,1)
        dist = dist + jnp.mean(jnp.sum(w * diff, axis=1))        # 1x1 conv + avg
    return dist


def _as_numpy_state_dict(obj) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in dict(obj).items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def load_lpips_params(path: str) -> Dict[str, jnp.ndarray]:
    """Load LPIPS params from .npz or a merged torch state dict (.pt/.pth).
    Accepts lin keys as `lin<k>.weight` or the lpips package's
    `lin<k>.model.1.weight`."""
    if path.endswith(".npz"):
        raw = dict(np.load(path))
    else:
        import torch
        raw = _as_numpy_state_dict(torch.load(path, map_location="cpu",
                                              weights_only=True))
    params: Dict[str, jnp.ndarray] = {}
    for k, v in raw.items():
        k = k.replace(".model.1.weight", ".weight")  # lpips package layout
        params[k] = jnp.asarray(v, jnp.float32)
    _validate(params)
    return params


def _validate(params: Dict[str, jnp.ndarray]) -> None:
    for idx in VGG16_CONV_IDX:
        for suffix in ("weight", "bias"):
            key = f"features.{idx}.{suffix}"
            if key not in params:
                raise KeyError(f"LPIPS weights missing {key}")
    for k, c in enumerate(TAP_CHANNELS):
        key = f"lin{k}.weight"
        if key not in params:
            raise KeyError(f"LPIPS weights missing {key}")
        if int(np.prod(params[key].shape)) != c:
            raise ValueError(f"{key} must have {c} elements, "
                             f"got shape {params[key].shape}")


def convert_torch_lpips(vgg16_path: str, lpips_path: str, out_npz: str) -> None:
    """Merge a torchvision VGG16 state dict + the lpips package's vgg.pth lin
    weights into the .npz this module loads."""
    import torch
    vgg = _as_numpy_state_dict(torch.load(vgg16_path, map_location="cpu",
                                          weights_only=True))
    lin = _as_numpy_state_dict(torch.load(lpips_path, map_location="cpu",
                                          weights_only=True))
    merged: Dict[str, np.ndarray] = {}
    for idx in VGG16_CONV_IDX:
        for suffix in ("weight", "bias"):
            merged[f"features.{idx}.{suffix}"] = vgg[f"features.{idx}.{suffix}"]
    for k in range(5):
        src = (f"lin{k}.model.1.weight" if f"lin{k}.model.1.weight" in lin
               else f"lin{k}.weight")
        merged[f"lin{k}.weight"] = lin[src]
    np.savez(out_npz, **merged)


# --- module-level metric binding (used by image_eval.eval_image) -------------

_WEIGHTS_PATH: Optional[str] = None


def set_lpips_weights(path: Optional[str]) -> None:
    """Point the eval pipeline at an LPIPS weight file (config
    extract_images.lpips_weights). Clears the cached metric."""
    global _WEIGHTS_PATH
    _WEIGHTS_PATH = path
    get_lpips_fn.cache_clear()


@functools.lru_cache(maxsize=1)
def get_lpips_fn():
    """Callable (a, b) -> float, or None when no weights are available.
    Preference order: configured weight file, then torchvision's pretrained
    VGG16 (absent in this image) with unit lin weights."""
    if _WEIGHTS_PATH and os.path.exists(_WEIGHTS_PATH):
        params = load_lpips_params(_WEIGHTS_PATH)

        def fn(a: np.ndarray, b: np.ndarray) -> float:
            return float(lpips_pair(params, jnp.asarray(a), jnp.asarray(b)))

        return fn
    try:
        import torchvision.models as tvm
        sd = tvm.vgg16(weights=tvm.VGG16_Weights.IMAGENET1K_V1).state_dict()
        params = {k: jnp.asarray(v.detach().cpu().numpy())
                  for k, v in sd.items() if k.startswith("features.")}
        for k, c in enumerate(TAP_CHANNELS):
            params[f"lin{k}.weight"] = jnp.full((1, c, 1, 1), 1.0 / c)

        def fn(a: np.ndarray, b: np.ndarray) -> float:
            return float(lpips_pair(params, jnp.asarray(a), jnp.asarray(b)))

        return fn
    except Exception:
        return None
