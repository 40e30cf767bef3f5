"""The NoPe-NeRF loss family as pure functions.

Capability parity with `model/losses.py:17-228` (Loss.forward): RGB L1/L2, depth L1 or
scale/shift-invariant, trajectory-smoothness (1st/2nd order), bidirectional Chamfer,
photometric warp (rgb_s), depth-consistency, and transform-cycle terms — weighted sum,
each term gated by its weight.

Dynamic-shape gathers in the reference (masked depth losses, `mean_on_mask`) are
replaced with masked reductions over static shapes: sum(x * mask) / sum(mask). This is
bit-equivalent to gather-then-mean and keeps one compiled program for every step.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .geometry.camera import rigid_inverse
from .ops.chamfer import chamfer_loss
from .utils.safemath import safe_norm
from .ops.ssim import ssim_loss_map


@dataclasses.dataclass(frozen=True)
class LossConfig:
    depth_loss_type: str = "l1"       # 'l1' | 'invariant'
    with_ssim: bool = False
    with_auto_mask: bool = False
    # Static enables — True if the term's annealed weight can ever be nonzero.
    use_rgb: bool = True
    use_depth: bool = True
    use_dist: bool = False
    use_pc: bool = True
    use_rgb_s: bool = True
    use_depth_consistency: bool = False
    use_t_cycle: bool = False

    @classmethod
    def from_cfg(cls, cfg: dict) -> "LossConfig":
        t = cfg["training"]

        def on(name):
            w = t[name]
            return bool(w[0] != 0.0 or w[1] != 0.0)

        return cls(
            depth_loss_type=t["depth_loss_type"],
            with_ssim=t["with_ssim"],
            with_auto_mask=t["with_auto_mask"],
            use_rgb=on("rgb_weight"),
            use_depth=on("depth_weight"),
            use_dist=on("weight_dist_1st_loss") or on("weight_dist_2nd_loss"),
            use_pc=on("pc_weight"),
            use_rgb_s=on("rgb_s_weight"),
            use_depth_consistency=on("depth_consistency_weight"),
            use_t_cycle=on("t_cycle_weight"),
        )


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """sum(x[mask])/sum(mask), 0 when the mask is empty (`mean_on_mask`,
    losses.py:79-87). Uses where-then-sum, not x*mask: the reference gathers, so a
    NaN/inf under an invalid entry never reaches the loss — 0 * NaN = NaN would."""
    maskb = mask.astype(bool)
    denom = jnp.sum(maskb.astype(x.dtype))
    total = jnp.sum(jnp.where(maskb, x, jnp.zeros_like(x)))
    return jnp.where(denom > 0, total / jnp.maximum(denom, 1.0), 0.0)


def masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Median over masked entries; torch.median semantics (lower of two middles)."""
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    vals = jnp.where(mask, x, big)
    order = jnp.sort(vals)
    count = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.maximum((count - 1) // 2, 0)
    return order[idx]


def rgb_loss(rgb_pred: jax.Array, rgb_gt: jax.Array, loss_type: str) -> jax.Array:
    """sum-normalized per-ray RGB loss (`get_rgb_full_loss`, losses.py:28-33):
    sum(|d|^p) / n_rays."""
    n = rgb_pred.shape[0]
    if loss_type == "l1":
        return jnp.sum(jnp.abs(rgb_pred - rgb_gt)) / n
    return jnp.sum((rgb_pred - rgb_gt) ** 2) / n


def depth_loss_l1(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """L1 over masked rays, normalized by masked count (`get_depth_loss` with the
    masked gather applied upstream, losses.py:60-63 + rendering.py:150-153)."""
    maskb = mask.astype(bool)
    count = jnp.sum(maskb.astype(pred.dtype))
    diff = jnp.where(maskb, jnp.abs(pred - gt), 0.0)
    return jnp.where(count > 0, jnp.sum(diff) / jnp.maximum(count, 1.0), 0.0)


def depth_loss_invariant(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Scale/shift-invariant depth loss (`depth_loss_dpt`, losses.py:35-58):
    median/MAD-normalize both, then MSE (masked)."""
    m = mask.astype(pred.dtype)
    count = jnp.maximum(jnp.sum(m), 1.0)

    # invalid entries are neutralized before any arithmetic (gather-equivalence)
    pred = jnp.where(mask.astype(bool), pred, 0.0)
    gt = jnp.where(mask.astype(bool), gt, 0.0)

    t_pred = masked_median(pred, mask)
    s_pred = jnp.sum(jnp.abs(pred - t_pred) * m) / count
    t_gt = masked_median(gt, mask)
    s_gt = jnp.sum(jnp.abs(gt - t_gt) * m) / count

    pred_n = (pred - t_pred) / jnp.maximum(s_pred, 1e-12)
    gt_n = (gt - t_gt) / jnp.maximum(s_gt, 1e-12)
    return masked_mean((pred_n - gt_n) ** 2, mask)


def weight_dist_loss(t_list: jax.Array):
    """Trajectory smoothness on camera translations (N, 3)
    (`get_weight_dist_loss`, losses.py:105-114)."""
    dist = t_list - jnp.roll(t_list, 1, axis=0)
    dist = safe_norm(dist[1:], axis=1)                # (N-1,) — grad-safe:
    # consecutive identical translations (identity init) are exact zeros
    dist_diff = (dist - jnp.roll(dist, 1))[1:]        # (N-2,)
    return jnp.mean(dist), jnp.mean(dist_diff ** 2)


def rgb_s_loss(rgb1: jax.Array, rgb2: jax.Array, valid: jax.Array,
               with_ssim: bool) -> jax.Array:
    """Photometric warp loss on (H, W, 3) image pair with (H, W, 1) validity
    (`get_rgb_s_loss`, losses.py:152-159)."""
    diff = jnp.clip(jnp.abs(rgb1 - rgb2), 0.0, 1.0)
    if with_ssim:
        diff = 0.15 * diff + 0.85 * ssim_loss_map(rgb1, rgb2)
    return masked_mean(diff, jnp.broadcast_to(valid, diff.shape))


def reprojection_loss(rgb: jax.Array, rgb_refs, valid_points: jax.Array,
                      rgb_refs_ori, with_auto_mask: bool = False) -> jax.Array:
    """Multi-reference photometric reprojection loss with optional auto-masking
    (`get_reprojection_loss`, losses.py:67-77): pixels where the warped reference
    matches worse than the *unwarped* one are dropped (moving-object heuristic)."""
    total = jnp.asarray(0.0, rgb.dtype)
    for rgb_ref, rgb_ref_ori in zip(rgb_refs, rgb_refs_ori):
        diff = jnp.abs(rgb - rgb_ref)
        valid = valid_points
        if with_auto_mask:
            auto = (jnp.mean(diff, axis=-1, keepdims=True)
                    < jnp.mean(jnp.abs(rgb - rgb_ref_ori), axis=-1, keepdims=True)
                    ).astype(rgb.dtype) * valid
            valid = auto
        total = total + masked_mean(diff, jnp.broadcast_to(valid, diff.shape))
    return total / len(rgb_refs)


def dpt_reprojection_loss(rgb: jax.Array, rgb_refs, valid_points: jax.Array,
                          rgb_img_refs_ori, with_auto_mask: bool = False,
                          with_ssim: bool = False) -> jax.Array:
    """DPT-mode reprojection loss with clamp + optional SSIM mixing
    (`get_DPT_reprojection_loss`, losses.py:88-104)."""
    total = jnp.asarray(0.0, rgb.dtype)
    for rgb_ref, rgb_ref_ori in zip(rgb_refs, rgb_img_refs_ori):
        diff = jnp.clip(jnp.abs(rgb - rgb_ref), 0.0, 1.0)
        valid = valid_points
        if with_auto_mask:
            auto = (jnp.mean(diff, axis=-1, keepdims=True)
                    < jnp.mean(jnp.abs(rgb - rgb_ref_ori), axis=-1, keepdims=True)
                    ).astype(rgb.dtype) * valid
            valid = auto
        if with_ssim:
            diff = 0.15 * diff + 0.85 * ssim_loss_map(rgb, rgb_ref)
        total = total + masked_mean(diff, jnp.broadcast_to(valid, diff.shape))
    return total / len(rgb_refs)


def depth_consistency_loss(d1_proj: jax.Array, d2: jax.Array,
                           d2_proj: Optional[jax.Array] = None,
                           d1: Optional[jax.Array] = None) -> jax.Array:
    """(`get_depth_consistency_loss`, losses.py:124-128): sum-L1 / N (+ symmetric)."""
    n = d1_proj.shape[0]
    loss = jnp.sum(jnp.abs(d1_proj - d2)) / n
    if d2_proj is not None:
        loss = 0.5 * loss + 0.5 * jnp.sum(jnp.abs(d2_proj - d1)) / d2_proj.shape[0]
    return loss


def t_cycle_loss(rt_pred: jax.Array, rt_gt: jax.Array) -> jax.Array:
    """|| I - rt_gt^-1 @ rt_pred ||_F (`get_t_cycle_loss`, losses.py:161-162)."""
    return safe_norm(jnp.eye(4, dtype=rt_pred.dtype)
                     - rigid_inverse(rt_gt) @ rt_pred, axis=(0, 1))


def compute_losses(cfg: LossConfig,
                   weights: Dict[str, jax.Array],
                   rgb_pred: Optional[jax.Array] = None,
                   rgb_gt: Optional[jax.Array] = None,
                   rgb_loss_type: str = "l2",
                   depth_pred: Optional[jax.Array] = None,
                   depth_gt: Optional[jax.Array] = None,
                   depth_mask: Optional[jax.Array] = None,
                   t_list: Optional[jax.Array] = None,
                   pc_x: Optional[jax.Array] = None,
                   pc_y: Optional[jax.Array] = None,
                   rgb_pc1: Optional[jax.Array] = None,
                   rgb_pc1_proj: Optional[jax.Array] = None,
                   valid_points: Optional[jax.Array] = None,
                   d1_proj: Optional[jax.Array] = None,
                   d2: Optional[jax.Array] = None,
                   d2_proj: Optional[jax.Array] = None,
                   d1: Optional[jax.Array] = None,
                   rt_12: Optional[jax.Array] = None,
                   rt_12_gt: Optional[jax.Array] = None,
                   chamfer_tile: int = 512,
                   chamfer_use_pallas: bool = False,
                   precomputed: Optional[Dict[str, jax.Array]] = None
                   ) -> Dict[str, jax.Array]:
    """Weighted total + per-term dict (parity with Loss.forward, losses.py:164-228).

    `weights` values may be traced scalars (annealed on host per epoch); term
    *enablement* is static via LossConfig so disabled subgraphs are never built.
    `precomputed` lets the trainer inject already-reduced rgb/depth/l2 scalars
    (the sharded render path psums them across devices).
    """
    zero = jnp.asarray(0.0, jnp.float32)

    if precomputed is not None:
        l_rgb = precomputed["loss_rgb"]
        l_depth = precomputed["loss_depth"]
    else:
        l_rgb = rgb_loss(rgb_pred, rgb_gt, rgb_loss_type) if cfg.use_rgb else zero

        if cfg.use_depth:
            mask = depth_mask if depth_mask is not None else jnp.ones_like(depth_pred, bool)
            if cfg.depth_loss_type == "l1":
                l_depth = depth_loss_l1(depth_pred, depth_gt, mask)
            else:
                l_depth = depth_loss_invariant(depth_pred, depth_gt, mask)
        else:
            l_depth = zero

    if cfg.use_dist:
        l_dist_1st, l_dist_2nd = weight_dist_loss(t_list)
    else:
        l_dist_1st, l_dist_2nd = zero, zero

    l_pc = (chamfer_loss(pc_x, pc_y, tile=chamfer_tile,
                     use_pallas=chamfer_use_pallas)
            if cfg.use_pc else zero)

    l_rgb_s = (rgb_s_loss(rgb_pc1, rgb_pc1_proj, valid_points, cfg.with_ssim)
               if cfg.use_rgb_s else zero)

    l_dc = (depth_consistency_loss(d1_proj, d2, d2_proj, d1)
            if cfg.use_depth_consistency else zero)

    l_cycle = t_cycle_loss(rt_12, rt_12_gt) if cfg.use_t_cycle else zero

    if precomputed is not None:
        l2_mean = precomputed["l2_mean"]
    elif cfg.use_rgb or cfg.use_depth:
        l2_mean = jnp.mean((rgb_pred - rgb_gt) ** 2)
    else:
        l2_mean = zero

    if precomputed is not None and "ray_total" in precomputed:
        # Single-kernel fused path (ops/pallas_render.render_ray_loss_fused):
        # the rgb+depth term arrives already weighted (the annealed weights are
        # baked into the kernel's cotangents); l_rgb/l_depth above are
        # stop-gradient metrics.
        ray_term = precomputed["ray_total"]
    else:
        ray_term = (weights["rgb_weight"] * l_rgb
                    + weights["depth_weight"] * l_depth)
    total = (ray_term
             + weights["weight_dist_1st_loss"] * l_dist_1st
             + weights["weight_dist_2nd_loss"] * l_dist_2nd
             + weights["pc_weight"] * l_pc
             + weights["rgb_s_weight"] * l_rgb_s
             + weights["depth_consistency_weight"] * l_dc
             + weights["t_cycle_weight"] * l_cycle)

    return {
        "loss": total,
        "loss_rgb": l_rgb,
        "loss_depth": l_depth,
        "l2_mean": l2_mean,
        "loss_dist_1st": l_dist_1st,
        "loss_dist_2nd": l_dist_2nd,
        "loss_pc": l_pc,
        "loss_rgb_s": l_rgb_s,
        "loss_depth_consistency": l_dc,
        "loss_t_cycle": l_cycle,
    }
