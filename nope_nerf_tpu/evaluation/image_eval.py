"""Image + depth quality evaluation for rendered views.

Capability parity with `model/eval_images.py:17-217` (Eval_Images): full-res chunked
render, PSNR/SSIM/LPIPS, metric depth rescale (sc ratio), [min,max]-validity masks and
the tp/fn/fp/tn confusion matrix, and the 7 aggregate depth metrics.

LPIPS: the reference uses the torch `lpips` package (VGG). That package is absent in
this image; when a torchvision VGG16 is importable we compute an LPIPS-style deep
perceptual distance through its feature stack, otherwise lpips is reported as None —
gated exactly like SURVEY.md §7.8 suggests.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np

from ..ops.ssim import ssim as ssim_fn
from ..utils.metrics import compute_errors, mse2psnr


@functools.lru_cache(maxsize=1)
def _lpips_fn():
    """Best-effort LPIPS: torch-hub VGG16 features with unit linear weights.
    Returns None when torchvision/weights are unavailable (offline image)."""
    try:
        import torch
        import torchvision.models as tvm
        vgg = tvm.vgg16(weights=tvm.VGG16_Weights.IMAGENET1K_V1).features.eval()
    except Exception:
        return None

    import torch

    slices = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def fn(a: np.ndarray, b: np.ndarray) -> float:
        with torch.no_grad():
            ta = (torch.from_numpy(a).permute(2, 0, 1)[None] - mean) / std
            tb = (torch.from_numpy(b).permute(2, 0, 1)[None] - mean) / std
            dist = 0.0
            xa, xb = ta, tb
            for lo, hi in slices:
                for i in range(lo, hi):
                    xa = vgg[i](xa)
                    xb = vgg[i](xb)
                na = xa / (xa.norm(dim=1, keepdim=True) + 1e-10)
                nb = xb / (xb.norm(dim=1, keepdim=True) + 1e-10)
                dist += ((na - nb) ** 2).mean().item()
            return dist

    return fn


def depth_confusion(depth_pred: np.ndarray, depth_gt: np.ndarray,
                    min_depth: float, max_depth: float
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Validity masks + normalized confusion matrix (eval_images.py:152-163,217).
    Returns (mask, mask_rendered, conf_mat 2x2 [[tp,fn],[fp,tn]]/n)."""
    mask_rendered = (depth_pred >= min_depth) & (depth_pred <= max_depth)
    mask_gt = (depth_gt >= min_depth) & (depth_gt <= max_depth)
    mask = mask_rendered & mask_gt
    n = depth_gt.size - 1  # reference normalizes by num_pixels[0,-1] = n-1
    conf = np.array([
        [np.sum(mask_rendered & mask_gt), np.sum(~mask_rendered & mask_gt)],
        [np.sum(mask_rendered & ~mask_gt), np.sum(~mask_rendered & ~mask_gt)],
    ], np.float64) / max(n, 1)
    return mask, mask_rendered, conf


def eval_image(rgb_pred: np.ndarray, rgb_gt: np.ndarray,
               depth_pred: Optional[np.ndarray] = None,
               depth_gt: Optional[np.ndarray] = None,
               sc: float = 1.0, min_depth: float = 0.1, max_depth: float = 20.0,
               with_lpips: bool = True) -> Dict:
    """Metrics for one rendered view vs GT (eval_images.py:47-217 minus file IO).

    depth_pred is rescaled to metric by `sc` (the preprocessing-scale ratio,
    evaluation/eval.py:171-175) and compared inside the joint validity mask.
    """
    import jax.numpy as jnp

    mse = float(np.mean((rgb_pred - rgb_gt) ** 2))
    psnr = float(mse2psnr(mse))
    ssim = float(ssim_fn(jnp.asarray(rgb_pred), jnp.asarray(rgb_gt)))

    lpips = None
    if with_lpips:
        fn = _lpips_fn()
        if fn is not None:
            lpips = fn(rgb_pred.astype(np.float32), rgb_gt.astype(np.float32))

    out: Dict = {"mse": mse, "psnr": psnr, "ssim": ssim, "lpips": lpips}

    if depth_pred is not None and depth_gt is not None:
        import cv2
        depth_out = depth_pred * sc
        gt_h, gt_w = depth_gt.shape[:2]
        if depth_out.shape != depth_gt.shape:
            depth_out = cv2.resize(depth_out, (gt_w, gt_h),
                                   interpolation=cv2.INTER_NEAREST_EXACT)
        mask, mask_rendered, conf = depth_confusion(depth_out, depth_gt,
                                                    min_depth, max_depth)
        out["conf_mat"] = conf
        out["depth_pred_masked"] = depth_out[mask]
        out["depth_gt_masked"] = depth_gt[mask]
        if mask.any():
            out["depth_errors"] = compute_errors(depth_gt[mask], depth_out[mask])
    return out


def aggregate_depth_errors(per_image: list) -> Dict[str, float]:
    """Concatenate masked depths over views and compute the 7 metrics once
    (evaluation/eval.py:200-212)."""
    preds = np.concatenate([d["depth_pred_masked"] for d in per_image])
    gts = np.concatenate([d["depth_gt_masked"] for d in per_image])
    abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = compute_errors(gts, preds)
    return {"abs_rel": abs_rel, "sq_rel": sq_rel, "rmse": rmse,
            "rmse_log": rmse_log, "a1": a1, "a2": a2, "a3": a3}
