"""The jitted train step and the host-side Trainer orchestration.

Capability parity with `model/training.py:16-416` (Trainer.train_step/compute_loss):
ray sampling with sparse-depth validity redraw, pose/distortion/focal application,
rendering, the inter-frame reference pair (point-cloud lift, relative-pose warp,
photometric reprojection), loss assembly, and four per-group Adam updates.

TPU-first redesign:
- the ENTIRE step (sampling -> render -> 8 losses -> 4 optimizer updates) is one
  XLA program: state in, state out, nothing leaves the device. The reference crosses
  the host boundary dozens of times per step (H2D copies at training.py:172-181,
  `.item()` reads, per-module optimizers);
- the frame-order swap (`img_idx < num_cams-1`, training.py:323-352) is a traced
  jnp.where select, not Python control flow, so one compiled program serves every
  frame;
- the sparse-depth resampling loop (training.py:281-283) is a static-shape
  single-substitution draw with the same >=1-valid guarantee;
- learning rates and annealed loss weights enter as traced scalars — the host can
  schedule them freely with zero recompiles.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.camera import (
    camera_matrix_from_focal,
    mm_exact,
    pixel_grid,
    project_to_cam,
    rigid_inverse,
    transform_to_world,
)
from ..losses import compute_losses
from ..models.distortions import distortion_scale_shift
from ..models.intrinsics import focal_fxfy
from ..models.nerf import nerf_apply  # noqa: F401  (re-export for kernels)
from ..models.poses import pose_c2w, pose_translations
from ..ops.interp import get_tensor_values, resize_area, resize_bilinear, resize_nearest
from ..ops.render import render_nope_nerf
from .state import ModelConfigs, TrainState, apply_updates_with_lr


def _draw_rays(key: jax.Array, hw: int, n: int) -> jax.Array:
    """n distinct pixel indices from [0, hw) — STRATIFIED-like, not the
    reference's uniform-without-replacement randperm(h*w)[:n].

    approx_max_k partitions the array into bins and keeps each bin's top
    candidates, so it cannot return many indices from one bin: the draw is
    closer to stratified sampling over pixel-index blocks than to a uniform
    n-subset (the earlier exchangeability argument here was wrong — the
    selection function is not symmetric in positions). Deliberate, documented
    deviation (PARITY.md): distinctness and per-index marginal uniformity
    hold, only high-order subset statistics differ, which if anything
    REDUCES estimator variance for the ray-batch loss. The exact
    alternatives were measured on v5e in-scan (minus the scan floor):
    approx_max_k 0.024 ms, exact top_k over random bits 0.23 ms,
    jax.random.permutation[:n] 0.32 ms — exactness would cost ~5-7% of the
    whole 4.3 ms train step. Reference: model/training.py:277.
    """
    vals = jax.random.uniform(key, (hw,))
    _, idx = jax.lax.approx_max_k(vals, n)
    return idx


def _sample_rays(key: jax.Array, hw: int, n: int, depth_mask_flat: Optional[jax.Array],
                 resample: bool) -> Tuple[jax.Array, jax.Array]:
    """randperm(h*w)[:n] with the reference's >=1-valid-sparse-depth guarantee
    (training.py:277-283). Returns (new_key, ray_idx).

    The reference redraws the whole batch until a valid pixel lands in it — a
    data-dependent loop that can spin unboundedly (and hangs outright on an
    all-invalid frame). Static-shape equivalent: draw once; if (and only if) no
    sampled pixel has a valid depth, substitute one known-valid index into
    slot 0. The guarantee is identical and the step stays a fixed-shape program
    (measured perf-neutral vs a lax.while_loop on v5e); the sampling
    distribution differs only on the redraw event itself, which at the
    reference's sparsest setting (1% density) has probability 0.99^1024 ~ 3e-5
    per step.
    """
    key, k0 = jax.random.split(key)
    idx = _draw_rays(k0, hw, n)
    if not resample or depth_mask_flat is None:
        return key, idx
    any_valid = jnp.any(depth_mask_flat[idx])
    forced = jnp.argmax(depth_mask_flat)  # first valid index (if one exists)
    idx = idx.at[0].set(jnp.where(any_valid, idx[0], forced))
    return key, idx


def _apply_distortion(depth: jax.Array, scale: jax.Array, shift: jax.Array,
                      shift_first: bool) -> jax.Array:
    """training.py:259-264 / :310-315."""
    if shift_first:
        return (depth + shift) * scale
    return depth * scale + shift


def _ray_terms(nerf_params, pixels, depth_prior, rgb_gt, prior_mask, camera_mat,
               world_mat, scale_mat, key, mc: ModelConfigs, rgb_loss_type: str,
               n_total: int, axis_name: Optional[str] = None,
               weights: Optional[Dict[str, jax.Array]] = None,
               occ_grid: Optional[jax.Array] = None):
    """Render a (shard of the) ray batch and reduce its loss terms to scalars.

    With axis_name set, runs inside shard_map over the ray axis: local sums are
    psum'd so every device returns the identical *global* rgb/depth/l2 values —
    the TPU-native replacement for the reference's single-device render
    (ray sharding per SURVEY.md §2.9).

    Returns (l_rgb, l_depth, l2_mean, ray_total). When the single-kernel fused
    loss path is eligible (weights given + ops/render.fused_train_eligible),
    ray_total is the already-weighted rgb+depth term computed by ONE pallas
    program that also produces every gradient (no separate forward kernel runs
    in the step — see ops/pallas_render.render_ray_loss_fused) and
    l_rgb/l_depth/l2_mean are stop-gradient metrics; otherwise ray_total is
    None and the caller weights l_rgb/l_depth itself.
    """
    from ..losses import depth_loss_invariant
    from ..ops.render import fused_train_eligible, fused_train_prepare

    use_fused_loss = (weights is not None
                      and mc.loss.depth_loss_type == "l1"
                      and fused_train_eligible(mc.render, mc.nerf,
                                               pixels.shape[0]))
    if use_fused_loss:
        from ..ops.pallas_render import pack_targets, render_ray_loss_fused

        ray_table, z_val, depth_gt, object_mask = fused_train_prepare(
            pixels, depth_prior, camera_mat, world_mat, scale_mat, key,
            mc.render, mc.nerf, add_noise=mc.stratified_noise,
            occ_grid=occ_grid)
        if mc.detach_gt_depth:
            depth_gt = jax.lax.stop_gradient(depth_gt)
        mask = object_mask & prior_mask
        count = jnp.sum(mask.astype(jnp.float32))
        if axis_name:
            count = jax.lax.psum(count, axis_name)
        w_rgb_s = weights["rgb_weight"] / n_total
        w_depth_s = (weights["depth_weight"] * (count > 0)
                     / jnp.maximum(count, 1.0))
        if not mc.loss.use_rgb:
            w_rgb_s = jnp.zeros_like(w_rgb_s)
        if not mc.loss.use_depth:
            w_depth_s = jnp.zeros_like(w_depth_s)
        tgt = pack_targets(rgb_gt, depth_gt, mask, w_rgb_s, w_depth_s)
        rgb_p = 1 if rgb_loss_type == "l1" else 2
        total, sums = render_ray_loss_fused(
            nerf_params, ray_table, z_val, tgt, mc.nerf,
            mc.render.dist_alpha, rgb_p, mc.render.white_background)
        sums = jax.lax.stop_gradient(sums)
        if axis_name:
            total = jax.lax.psum(total, axis_name)
            sums = jax.lax.psum(sums, axis_name)
        zero = jnp.asarray(0.0, jnp.float32)
        l_rgb = sums[0] / n_total if mc.loss.use_rgb else zero
        l_depth = (jnp.where(count > 0, sums[1] / jnp.maximum(count, 1.0), 0.0)
                   if mc.loss.use_depth else zero)
        l2_mean = sums[2] / (n_total * 3)
        return l_rgb, l_depth, l2_mean, total

    out = render_nope_nerf(nerf_params, pixels, depth_prior, camera_mat,
                           world_mat, scale_mat, key, mc.render, mc.nerf,
                           add_noise=mc.stratified_noise, eval_=False,
                           occ_grid=occ_grid)
    depth_pred = out["depth_pred"]
    depth_gt = out["depth_gt"]
    if mc.detach_gt_depth:
        depth_gt = jax.lax.stop_gradient(depth_gt)
    mask = out["object_mask"] & prior_mask

    lcfg = mc.loss
    zero = jnp.asarray(0.0, jnp.float32)

    def allreduce(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    if lcfg.use_rgb:
        p = 1 if rgb_loss_type == "l1" else 2
        diff = jnp.abs(out["rgb"] - rgb_gt)
        l_rgb = allreduce(jnp.sum(diff if p == 1 else diff * diff)) / n_total
    else:
        l_rgb = zero

    if lcfg.use_depth:
        if lcfg.depth_loss_type == "l1":
            dsum = allreduce(jnp.sum(jnp.where(mask, jnp.abs(depth_pred - depth_gt), 0.0)))
            dcount = allreduce(jnp.sum(mask.astype(jnp.float32)))
            l_depth = jnp.where(dcount > 0, dsum / jnp.maximum(dcount, 1.0), 0.0)
        else:
            # the invariant loss needs a global median — gather the (small) ray batch
            if axis_name:
                depth_pred_g = jax.lax.all_gather(depth_pred, axis_name, tiled=True)
                depth_gt_g = jax.lax.all_gather(depth_gt, axis_name, tiled=True)
                mask_g = jax.lax.all_gather(mask, axis_name, tiled=True)
            else:
                depth_pred_g, depth_gt_g, mask_g = depth_pred, depth_gt, mask
            l_depth = depth_loss_invariant(depth_pred_g, depth_gt_g, mask_g)
    else:
        l_depth = zero

    if lcfg.use_rgb or lcfg.use_depth:
        l2_mean = allreduce(jnp.sum((out["rgb"] - rgb_gt) ** 2)) / (n_total * 3)
    else:
        l2_mean = zero
    return l_rgb, l_depth, l2_mean, None


def compute_step_loss(params: Dict[str, Any], batch: Dict[str, jax.Array],
                      weights: Dict[str, jax.Array], ray_idx: jax.Array,
                      key: jax.Array, mc: ModelConfigs, rgb_loss_type: str,
                      mesh=None) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Pure loss for one frame (+ its reference frame). Differentiable in `params`.

    With `mesh` set (a 1-axis ('data',) jax Mesh), the render fans out over the ray
    axis via shard_map — gradients flow through the psums and are correct globally.
    """
    img = batch["img"]                      # (H, W, 3)
    depth_input = batch["depth"]            # (H, W)
    depth_mask = batch["depth_mask"]        # (H, W) bool
    idx = batch["idx"]
    pose_gt = batch["pose_gt"]              # (4, 4) c2w
    h, w, _ = img.shape
    lcfg = mc.loss

    # --- pose ---------------------------------------------------------------
    if mc.pose is not None:
        c2w = pose_c2w(params["pose"], idx, mc.pose)
        world_mat = rigid_inverse(c2w)
        t_list = pose_translations(params["pose"], mc.pose)
    else:
        world_mat = rigid_inverse(pose_gt)
        t_list = None
    world_mat_gt = rigid_inverse(pose_gt)

    # --- depth distortion ---------------------------------------------------
    if mc.distortion is not None:
        scale_in, shift_in = distortion_scale_shift(params["distortion"], idx,
                                                    mc.distortion)
        depth_input = _apply_distortion(depth_input, scale_in[0], shift_in[0],
                                        mc.shift_first)
    else:
        scale_in = jnp.ones((1,), img.dtype)
        shift_in = jnp.zeros((1,), img.dtype)

    # --- intrinsics ---------------------------------------------------------
    if mc.focal is not None:
        fxfy = focal_fxfy(params["focal"], mc.focal)
        camera_mat = camera_matrix_from_focal(fxfy[0], fxfy[1])
    else:
        camera_mat = batch["camera_mat"]
    scale_mat = batch.get("scale_mat")

    # --- render the sampled rays -------------------------------------------
    # 2-D gathers (row, col) instead of reshape(-1)[ray_idx]: the flatten of
    # the (H,W,3) image materialized a full copy every step (~0.05 ms on v5e)
    # just to feed a 1024-row gather. Values are identical (row-major index
    # split); the [-1,1] pixel coordinates are recomputed elementwise with
    # the same op sequence as pixel_grid — XLA's division rounds a minority
    # of lanes 1 ulp differently from pixel_grid's numpy constant, so the
    # agreement with the eval/pose-opt pixel grid is 1-ulp, not bitwise.
    iy = ray_idx // w
    ix = ray_idx % w
    rgb_gt = img[iy, ix]
    pixels = jnp.stack([2.0 * ix.astype(img.dtype) / (w - 1) - 1.0,
                        2.0 * iy.astype(img.dtype) / (h - 1) - 1.0], axis=-1)
    # per-ray depth prior: full-frame resize (area) then gather (network.py:19-33)
    depth_resized = resize_area(depth_input[..., None], (h, w))[..., 0]
    depth_prior = depth_resized[iy, ix][:, None]

    render_model = lcfg.use_rgb or lcfg.use_depth
    precomputed = None
    if render_model:
        prior_mask = depth_mask[iy, ix]
        n_total = mc.n_training_points
        occ_grid = batch.get("occ_grid")
        if mesh is None:
            l_rgb, l_depth, l2_mean, ray_total = _ray_terms(
                params["nerf"], pixels, depth_prior, rgb_gt, prior_mask, camera_mat,
                world_mat, scale_mat, key, mc, rgb_loss_type, n_total,
                weights=weights, occ_grid=occ_grid)
        else:
            from jax.sharding import PartitionSpec as P

            from ..ops.render import fused_train_eligible

            n_dev = mesh.devices.size
            # Decide the fused path ONCE, from the actual per-shard ray count —
            # _ray_terms makes the identical check from pixels_s.shape[0], so
            # the sentinel below can never mask a real total (or vice versa).
            fused = (lcfg.depth_loss_type == "l1"
                     and fused_train_eligible(mc.render, mc.nerf,
                                              pixels.shape[0] // n_dev))

            def shard_fn(nerf_params, pixels_s, depth_prior_s, rgb_gt_s, mask_s,
                         camera_mat_r, world_mat_r, keys_s, w_rgb, w_depth,
                         *grid_arg):
                lr, ld, l2, tot = _ray_terms(
                    nerf_params, pixels_s, depth_prior_s, rgb_gt_s,
                    mask_s, camera_mat_r, world_mat_r, None,
                    keys_s[0], mc, rgb_loss_type, n_total,
                    axis_name="data",
                    weights=({"rgb_weight": w_rgb, "depth_weight": w_depth}
                             if fused else None),
                    occ_grid=grid_arg[0] if grid_arg else None)
                # shard_map outputs can't be None — a sentinel stands in when
                # the unfused path ran (discarded below; `fused` is static).
                return lr, ld, l2, (tot if tot is not None
                                    else jnp.asarray(0.0, jnp.float32))

            keys = jax.random.split(key, n_dev)
            grid_args = () if occ_grid is None else (occ_grid,)  # replicated
            l_rgb, l_depth, l2_mean, ray_total = jax.shard_map(
                shard_fn, mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                          P(), P(), P("data"), P(), P())
                         + tuple(P() for _ in grid_args),
                out_specs=(P(), P(), P(), P()),
                check_vma=False,
            )(params["nerf"], pixels, depth_prior, rgb_gt, prior_mask,
              camera_mat, world_mat, keys,
              jnp.asarray(weights["rgb_weight"], jnp.float32),
              jnp.asarray(weights["depth_weight"], jnp.float32), *grid_args)
            if not fused:
                ray_total = None
        precomputed = {"loss_rgb": l_rgb, "loss_depth": l_depth, "l2_mean": l2_mean}
        if ray_total is not None:
            precomputed["ray_total"] = ray_total
    else:
        precomputed = {"loss_rgb": jnp.asarray(0.0, jnp.float32),
                       "loss_depth": jnp.asarray(0.0, jnp.float32),
                       "l2_mean": jnp.asarray(0.0, jnp.float32)}

    # --- inter-frame reference pair ----------------------------------------
    loss_kwargs: Dict[str, Any] = {}
    use_ref = lcfg.use_pc or lcfg.use_rgb_s or lcfg.use_t_cycle
    if use_ref:
        assert mc.pose is not None, "pair losses require learned poses"
        ref_idx = batch["ref_idx"]
        ref_img = batch["ref_img"]
        depth_ref = batch["ref_depth"]
        ref_pose_gt = batch["ref_pose_gt"]
        num_cams = mc.pose.num_cams
        nl = mc.nearest_limit

        c2w_ref = pose_c2w(params["pose"], ref_idx, mc.pose)
        if mc.distortion is not None:
            scale_ref, shift_ref = distortion_scale_shift(params["distortion"],
                                                          ref_idx, mc.distortion)
            depth_ref = _apply_distortion(depth_ref, scale_ref[0], shift_ref[0],
                                          mc.shift_first)
        else:
            scale_ref = jnp.ones((1,), img.dtype)
        if mc.detach_ref_img:
            c2w_ref = jax.lax.stop_gradient(c2w_ref)
            scale_ref = jax.lax.stop_gradient(scale_ref)
            depth_ref = jax.lax.stop_gradient(depth_ref)
        ref_Rt = rigid_inverse(c2w_ref)
        ref_Rt_gt = rigid_inverse(ref_pose_gt)

        # frame ordering: frame 1 must precede frame 2 (training.py:323-352)
        fwd = idx < (num_cams - 1)

        def sel(a, b):
            return jnp.where(fwd, a, b)

        d1 = sel(depth_input, depth_ref)
        d2 = sel(depth_ref, depth_input)
        img1 = sel(img, ref_img)
        img2 = sel(ref_img, img)
        Rt_rel_12 = sel(mm_exact(ref_Rt, rigid_inverse(world_mat)),
                        mm_exact(world_mat, rigid_inverse(ref_Rt)))
        Rt_rel_12_gt = sel(mm_exact(ref_Rt_gt, rigid_inverse(world_mat_gt)),
                           mm_exact(world_mat_gt, rigid_inverse(ref_Rt_gt)))
        scale1 = sel(scale_in, scale_ref)
        R_rel = Rt_rel_12[:3, :3]
        t_rel = Rt_rel_12[:3, 3]

        sh, sw = h // mc.pc_ratio, w // mc.pc_ratio
        _, p_pc = pixel_grid((sh, sw), dtype=img.dtype)
        d1s = resize_nearest(d1[..., None], (sh, sw)).reshape(-1)
        d2s = resize_nearest(d2[..., None], (sh, sw)).reshape(-1)
        d1s = jnp.maximum(d1s, nl)  # training.py:359-360
        d2s = jnp.maximum(d2s, nl)
        pc1 = transform_to_world(p_pc, d1s[:, None], camera_mat)
        pc2 = transform_to_world(p_pc, d2s[:, None], camera_mat)

        if lcfg.use_rgb_s:
            if "img_small" in batch:
                # per-frame STATIC tensors, precomputed once per scene
                # (run_steps warp cache): same ops, bitwise-equal values,
                # ~0.15 ms/step of resizes + fixed-grid gathers hoisted
                img2s = sel(batch["ref_img_small"], batch["img_small"])
                rgb_pc1 = sel(batch["rgb_pc"], batch["ref_rgb_pc"])
            else:
                img1s = resize_bilinear(img1, (sh, sw))
                img2s = resize_bilinear(img2, (sh, sw))
                rgb_pc1 = get_tensor_values(img1s, p_pc, mode="bilinear",
                                            scale=False, align_corners=True)
            pc1_base = jax.lax.stop_gradient(pc1) if mc.detach_rgbs_scale else pc1
            pc1_rot = mm_exact(pc1_base, R_rel.T) + t_rel
            invalid = (-pc1_rot[:, 2:]) < nl  # in front of / too close to cam 2
            pc1_rot = jnp.where(jnp.broadcast_to(invalid, pc1_rot.shape),
                                jnp.asarray(nl, img.dtype), pc1_rot)
            p_reproj, valid_mask = project_to_cam(pc1_rot, camera_mat)
            rgb_pc1_proj = get_tensor_values(img2s, p_reproj, mode="bilinear",
                                             scale=False, align_corners=True)
            loss_kwargs.update(
                rgb_pc1=rgb_pc1.reshape(sh, sw, 3),
                rgb_pc1_proj=rgb_pc1_proj.reshape(sh, sw, 3),
                valid_points=valid_mask.reshape(sh, sw, 1).astype(img.dtype),
            )

        if mc.scale_pcs:  # training.py:394-396
            pc1 = pc1 / scale1
            pc2 = pc2 / scale1

        loss_kwargs.update(
            pc_x=mm_exact(pc1, R_rel.T) + t_rel,
            pc_y=pc2,
            rt_12=Rt_rel_12,
            rt_12_gt=Rt_rel_12_gt,
        )

    loss_dict = compute_losses(
        lcfg, weights, rgb_loss_type=rgb_loss_type, t_list=t_list,
        chamfer_tile=mc.chamfer_tile, chamfer_use_pallas=mc.use_pallas_chamfer,
        precomputed=precomputed, **loss_kwargs)
    loss_dict["scale"] = scale_in[0]
    loss_dict["shift"] = shift_in[0]
    return loss_dict["loss"], loss_dict


@functools.partial(jax.jit,
                   static_argnames=("mc", "rgb_loss_type", "optimizers", "mesh"))
def train_step(state: TrainState, batch: Dict[str, jax.Array],
               weights: Dict[str, jax.Array], lrs: Dict[str, jax.Array],
               mc: ModelConfigs, rgb_loss_type: str, optimizers,
               mesh=None) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One full optimization step: state -> (state, metrics). `optimizers` is the
    hashable tuple of (group, optax transform) pairs from create_train_state;
    `mesh` (optional, static) fans the render out over its 'data' axis."""
    opt = dict(optimizers)
    key, kray, krender = jax.random.split(state.rng, 3)

    h, w, _ = batch["img"].shape
    if mesh is not None:
        assert mc.n_training_points % mesh.devices.size == 0, (
            "n_training_points must divide evenly across the data axis")
    key, ray_idx = _sample_rays(
        kray, h * w, mc.n_training_points,
        batch["depth_mask"].reshape(-1) if mc.use_sparse_depth_resample else None,
        mc.use_sparse_depth_resample)

    grads, loss_dict = jax.grad(compute_step_loss, has_aux=True)(
        state.params, batch, weights, ray_idx, krender, mc, rgb_loss_type, mesh)

    new_params = dict(state.params)
    new_opt_state = dict(state.opt_state)
    for group in state.params:
        updates, new_opt_state[group] = opt[group].update(
            grads[group], state.opt_state[group], state.params[group])
        new_params[group] = apply_updates_with_lr(state.params[group], updates,
                                                  lrs[group])

    new_state = TrainState(params=new_params, opt_state=new_opt_state,
                           it=state.it + 1, rng=key)
    return new_state, loss_dict


@functools.partial(jax.jit,
                   static_argnames=("mc", "rgb_loss_type", "optimizers", "mesh"))
def train_steps(state: TrainState, scene_stack: Dict[str, jax.Array],
                order: jax.Array, ref_order: jax.Array,
                weights: Dict[str, jax.Array], lrs: Dict[str, jax.Array],
                mc: ModelConfigs, rgb_loss_type: str, optimizers,
                mesh=None) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """lax.scan over len(order) full train steps in ONE device dispatch.

    TPU-native replacement for the reference's per-batch Python loop
    (train.py:210): the scene lives on device (scene_stack holds the stacked
    per-frame arrays) and each scan iteration gathers its frame pair by index,
    so a whole chunk of steps runs without host round-trips. Numerically
    identical to calling train_step per frame (same RNG chain through
    state.rng, same schedule scalars — both are constant within an epoch).
    Returns (state, loss_dict with a leading step axis).
    """

    def gather(a, i):
        return jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)

    def body(st, io):
        idx, ref = io
        batch = {
            "img": gather(scene_stack["imgs"], idx),
            "depth": gather(scene_stack["depths"], idx),
            "depth_mask": gather(scene_stack["depth_masks"], idx),
            "camera_mat": scene_stack["K"],
            "pose_gt": gather(scene_stack["c2ws_gt"], idx),
            "idx": idx,
            "ref_img": gather(scene_stack["imgs"], ref),
            "ref_depth": gather(scene_stack["depths"], ref),
            "ref_pose_gt": gather(scene_stack["c2ws_gt"], ref),
            "ref_idx": ref,
        }
        if "imgs_small" in scene_stack:
            batch["img_small"] = gather(scene_stack["imgs_small"], idx)
            batch["ref_img_small"] = gather(scene_stack["imgs_small"], ref)
            batch["rgb_pc"] = gather(scene_stack["rgb_pc"], idx)
            batch["ref_rgb_pc"] = gather(scene_stack["rgb_pc"], ref)
        if "occ_grid" in scene_stack:
            batch["occ_grid"] = scene_stack["occ_grid"]
        return train_step(st, batch, weights, lrs, mc, rgb_loss_type,
                          optimizers, mesh)

    return jax.lax.scan(body, state, (order, ref_order))


class Trainer:
    """Host-side orchestration: schedules, logging hooks, full-frame visualization.

    The per-step compute lives in `train_step` (jitted); this class only owns scalar
    schedule state — mirroring the reference's split between Trainer and train.py's
    epoch loop, minus the module soup.
    """

    def __init__(self, cfg: dict, mc: ModelConfigs, optimizers: Dict[str, Any],
                 mesh=None):
        self.cfg = cfg
        self.mc = mc
        self.mesh = mesh
        self._jit_cache: Dict[Any, Any] = {}
        # hashable static arg for jit
        self.optimizers = tuple(sorted(optimizers.items()))
        t = cfg["training"]
        self.base_lrs = {"nerf": t["learning_rate"], "pose": t["pose_lr"],
                         "focal": t["focal_lr"], "distortion": t["distortion_lr"]}
        self.gammas = {"nerf": t["scheduler_gamma"], "pose": t["scheduler_gamma_pose"],
                       "focal": t["scheduler_gamma_focal"],
                       "distortion": t["scheduler_gamma_distortion"]}
        self.decay_intervals = {"nerf": 10, "pose": 100, "focal": 100,
                                "distortion": 100}
        # schedule scalars change once per epoch — cache their device arrays so a
        # step doesn't pay ~16 host->device scalar uploads (costly over remote
        # device transports)
        self._sched_cache = {}
        # per-scene photometric-warp cache (see _warp_frames)
        self._warp_cache = None
        # occupancy-grid guided sampling (ops/occupancy.py; opt-in extension)
        r = cfg["rendering"]
        self.occ_grid = None
        self._occ_enabled = bool(r.get("occupancy_grid", False))
        self._occ_res = int(r.get("occupancy_res", 64))
        self._occ_decay = float(r.get("occupancy_decay", 0.95))
        self._occ_update_every = int(r.get("occupancy_update_every", 1))
        if self._occ_enabled and self.mc.render.sample_option == "ndc":
            # the NDC branch takes sampling priority (ops/render.py z_val
            # selection) — keeping the grid would only burn a 262k-point
            # density query per epoch and bloat checkpoints
            print("WARNING: rendering.occupancy_grid is ignored with "
                  "sample_option=ndc (NDC z-sampling takes priority); "
                  "disabling occupancy for this run")
            self._occ_enabled = False

    def lrs_at(self, epoch: int, scheduling_start: int) -> Dict[str, jnp.ndarray]:
        from .scheduler import lr_at_epoch
        return {g: jnp.asarray(
            lr_at_epoch(self.base_lrs[g], self.gammas[g], scheduling_start, epoch,
                        self.decay_intervals[g]), jnp.float32)
            for g in self.base_lrs}

    def weights_at(self, epoch: int, scheduling_start: int) -> Dict[str, jnp.ndarray]:
        from .scheduler import annealed_weights
        return {k: jnp.asarray(v, jnp.float32) for k, v in
                annealed_weights(self.cfg["training"], scheduling_start, epoch).items()}

    def rgb_loss_type(self, epoch: int, scheduling_start: int) -> str:
        from .scheduler import rgb_loss_type_at
        return rgb_loss_type_at(self.cfg["training"], scheduling_start, epoch)

    def _globalize(self, tree):
        """Host-local pytree -> global replicated arrays when running
        multi-process over a host-spanning mesh; identity otherwise. Every jit
        input must be a global array in that mode."""
        if self.mesh is not None and jax.process_count() > 1:
            from ..parallel import globalize_replicated
            return globalize_replicated(tree, self.mesh)
        return tree

    def _sched_at(self, epoch: int, scheduling_start: int):
        """(weights, lrs, rgb_loss_type) for this epoch — device-cached so a
        step pays no host->device scalar uploads, and globalized for
        multi-process runs (shared by step() and run_steps())."""
        key = (epoch, scheduling_start)
        sched = self._sched_cache.get(key)
        if sched is None:
            sched = (self._globalize(self.weights_at(epoch, scheduling_start)),
                     self._globalize(self.lrs_at(epoch, scheduling_start)),
                     self.rgb_loss_type(epoch, scheduling_start))
            self._sched_cache = {key: sched}  # keep only the current epoch
        return sched

    def step(self, state: TrainState, batch: Dict[str, jax.Array], epoch: int,
             scheduling_start: int) -> Tuple[TrainState, Dict[str, jax.Array]]:
        weights, lrs, rgb_loss_type = self._sched_at(epoch, scheduling_start)
        if self.occ_grid is not None and "occ_grid" not in batch:
            batch = {**batch, "occ_grid": self.occ_grid}
        return train_step(state, batch, weights, lrs, self.mc, rgb_loss_type,
                          self.optimizers, self.mesh)

    def run_steps(self, state: TrainState, scene, order, ref_order, epoch: int,
                  scheduling_start: int) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """Scan-fused chunk of steps: one dispatch for len(order) frames (see
        train_steps). `scene` is a (device-resident) SceneData; order/ref_order
        come from data.epoch_order."""
        weights, lrs, rgb_loss_type = self._sched_at(epoch, scheduling_start)
        scene_stack = {"imgs": scene.imgs, "depths": scene.depths,
                       "depth_masks": scene.depth_masks, "K": scene.K,
                       "c2ws_gt": scene.c2ws_gt}
        small, rgb_pc = self._warp_frames(scene)
        if small is not None:
            scene_stack["imgs_small"] = small
            scene_stack["rgb_pc"] = rgb_pc
        if self.occ_grid is not None:
            scene_stack["occ_grid"] = self.occ_grid
        return train_steps(state, scene_stack, jnp.asarray(order, jnp.int32),
                           jnp.asarray(ref_order, jnp.int32), weights, lrs,
                           self.mc, rgb_loss_type, self.optimizers, self.mesh)

    def _warp_frames(self, scene):
        """Per-frame STATIC warp tensors, computed once per scene and reused
        every epoch: the pc_ratio-downsampled images and the source-side
        photometric samples rgb_pc1 = bilinear(img_small, fixed pixel grid).
        Exactly the ops the step would run (bitwise-equal values) — but the
        step paid ~0.15 ms re-deriving these frame constants every step."""
        if self.mc.pose is None:
            return None, None
        # key on the ARRAY OBJECT (strong reference kept in the cache tuple):
        # an id()-only key could alias a recycled address after the first
        # scene's imgs is garbage-collected
        if self._warp_cache is None or self._warp_cache[0] is not scene.imgs:
            import jax

            @jax.jit
            def build(imgs):
                h, w = imgs.shape[1:3]
                sh, sw = h // self.mc.pc_ratio, w // self.mc.pc_ratio
                _, p_pc = pixel_grid((sh, sw), dtype=imgs.dtype)
                small = jnp.stack([resize_bilinear(im, (sh, sw))
                                   for im in imgs])
                rgb_pc = jnp.stack([
                    get_tensor_values(sm, p_pc, mode="bilinear", scale=False,
                                      align_corners=True) for sm in small])
                return small, rgb_pc

            self._warp_cache = (scene.imgs,) + tuple(
                build(jnp.asarray(scene.imgs)))
        return self._warp_cache[1], self._warp_cache[2]

    def set_occupancy_grid(self, grid) -> None:
        """Install a grid (e.g. restored from a checkpoint). Ignored when the
        feature is disabled — a resumed checkpoint from an occupancy run must
        not silently re-enable occupancy sampling under a config that turned it
        off. Globalized for multi-process runs."""
        if not self._occ_enabled:
            return
        grid = jnp.asarray(grid)
        if grid.shape[0] != self._occ_res:
            # update_occupancy never recreates a non-None grid, so the
            # checkpointed resolution would silently rule the whole run
            print(f"WARNING: checkpointed occupancy grid is {grid.shape[0]}^3 "
                  f"but rendering.occupancy_res={self._occ_res}; keeping the "
                  "checkpoint's resolution for this run")
        self.occ_grid = self._globalize(grid)

    def reset_occupancy(self) -> None:
        """Fresh all-ones grid (scheduling_mode=reset discards the field the
        EMA describes). Keeps shape/enabled invariants in one place."""
        if self.occ_grid is None:
            return
        from ..ops.occupancy import make_occupancy_grid
        self.occ_grid = self._globalize(make_occupancy_grid(self._occ_res))

    def update_occupancy(self, state: TrainState, epoch: int) -> None:
        """EMA-update the occupancy grid from the current field. Call once per
        epoch from the host loop — ONE extra device dispatch.

        The grid is CREATED on the first call whenever the feature is enabled
        (independent of the update cadence) so the batch pytree structure is
        stable from epoch 0 — a grid appearing mid-run would force the jitted
        scan-epoch program to recompile. update_every <= 0 means "never
        EMA-update" (the grid stays as created/loaded).
        """
        if not self._occ_enabled:
            return
        from ..ops.occupancy import make_occupancy_grid, update_occupancy_grid
        if self.occ_grid is None:
            self.occ_grid = self._globalize(make_occupancy_grid(self._occ_res))
            far = self.mc.render.depth_range[1]
            if far > self.mc.render.occ_radius:
                print(f"WARNING: rendering.depth_range far ({far}) exceeds the "
                      f"occupancy cube radius ({self.mc.render.occ_radius}); "
                      "content beyond the cube only gets floor-level sampling — "
                      "set rendering.radius to cover the scene")
        if self._occ_update_every <= 0 or epoch % self._occ_update_every:
            return
        kgrid = jax.random.fold_in(jax.random.key(17), epoch)
        self.occ_grid = update_occupancy_grid(
            self.occ_grid, state.params["nerf"], kgrid, self.mc.nerf,
            radius=self.mc.render.occ_radius, decay=self._occ_decay)

    def render_frame(self, state: TrainState, batch: Dict[str, jax.Array],
                     resolution: Tuple[int, int], chunk: int = 131072,
                     use_learned_pose: bool = True,
                     sync: bool = True,
                     rows: Optional[Tuple[int, int]] = None) -> Dict[str, Any]:
        """Full-frame eval render in fixed-size ray chunks (reference render_visdata,
        training.py:103-165). Returns {'rgb': (h,w,3), 'depth': (h,w)}.

        TPU-first: the reference's 1024-px chunks are a GPU-memory convention;
        on TPU each chunk is a dispatch, and the fused kernel's VMEM footprint
        is independent of chunk size (it only sets the grid), so big chunks are
        strictly better — the 128k default renders a whole 188x621 frame in ONE
        dispatch (measured 9.8 s -> 0.21 s/frame on v5e with the jit cache).

        sync=False returns a PENDING frame (device arrays, dispatch already
        queued, nothing read back); pass it to finalize_frame to get numpy.
        Multi-frame callers overlap the next frame's compute with this frame's
        host readback — on remote-transport devices a per-frame sync costs more
        than the render itself (measured 345 -> ~190 ms/frame on the tunneled
        v5e at 188x621).

        rows=(lo, hi) renders only that row slab of the frame (the multi-host
        eval tiling unit, SURVEY.md §2.9: each host renders disjoint image
        tiles; see render_frame_multihost). Per-ray math is independent, so a
        slab equals the same rows of a full-frame render."""
        import numpy as np
        h, w = resolution
        mc = self.mc
        if use_learned_pose and mc.pose is not None:
            c2w = pose_c2w(state.params["pose"], batch["idx"], mc.pose)
            world_mat = rigid_inverse(c2w)
        else:
            world_mat = rigid_inverse(batch["pose_gt"])
        if mc.focal is not None:
            fxfy = focal_fxfy(state.params["focal"], mc.focal)
            camera_mat = camera_matrix_from_focal(fxfy[0], fxfy[1])
        else:
            camera_mat = batch["camera_mat"]
        depth_input = batch["depth"]
        if mc.distortion is not None:
            s, sh_ = distortion_scale_shift(state.params["distortion"], batch["idx"],
                                            mc.distortion)
            depth_input = _apply_distortion(depth_input, s[0], sh_[0], mc.shift_first)
        depth_resized = resize_area(depth_input[..., None], (h, w)).reshape(-1)

        _, pixels_all = pixel_grid((h, w))
        if rows is not None:
            lo, hi = rows
            # depth prior resize stays FULL-frame (area weights depend on the
            # whole image) — only the ray slab is cut
            pixels_all = pixels_all[lo * w:hi * w]
            depth_resized = depth_resized[lo * w:hi * w]
            h = hi - lo
        n = h * w
        # Never render more padding than the kernel's 8-ray tile requires: for
        # frames smaller than `chunk`, a full-chunk pad would render up to 7x
        # the frame's rays (all trimmed afterwards).
        chunk = min(chunk, -(-n // 8) * 8)
        pad = (-n) % chunk
        pixels_p = jnp.concatenate(
            [pixels_all, jnp.zeros((pad, 2), pixels_all.dtype)], 0)
        depth_p = jnp.concatenate([depth_resized, jnp.ones((pad,))], 0)

        # The jitted chunk renderer must be cached on self: a fresh jax.jit
        # wrapper per call re-traces and re-compiles every frame (~3 s/frame on
        # v5e at chunk=128k — 15x the actual render time).
        cache_key = ("render_chunk", chunk)
        render_chunk = self._jit_cache.get(cache_key)
        if render_chunk is None:
            render_chunk = jax.jit(functools.partial(
                render_nope_nerf, rcfg=mc.render, ncfg=mc.nerf,
                add_noise=False, eval_=True, need_aux=False))
            self._jit_cache[cache_key] = render_chunk
        rgbs, depths = [], []
        for i in range(0, n + pad, chunk):
            out = render_chunk(state.params["nerf"], pixels_p[i:i + chunk],
                               depth_p[i:i + chunk, None], camera_mat, world_mat,
                               None, None)
            rgbs.append(out["rgb"])
            depths.append(out["depth_pred"])
        pending = {"rgb_chunks": rgbs, "depth_chunks": depths,
                   "n": n, "resolution": (h, w)}
        return self.finalize_frame(pending) if sync else pending

    @staticmethod
    def finalize_frame(pending: Dict[str, Any]) -> Dict[str, Any]:
        """Read back a pending render_frame(sync=False) result -> numpy dict."""
        import numpy as np
        h, w = pending["resolution"]
        n = pending["n"]
        rgb = np.concatenate([np.asarray(r) for r in pending["rgb_chunks"]])
        depth = np.concatenate([np.asarray(d) for d in pending["depth_chunks"]])
        return {"rgb": rgb[:n].reshape(h, w, 3), "depth": depth[:n].reshape(h, w)}

    def render_frame_multihost(self, state: TrainState,
                               batch: Dict[str, jax.Array],
                               resolution: Tuple[int, int],
                               chunk: int = 131072,
                               use_learned_pose: bool = True) -> Dict[str, Any]:
        """Full-frame eval render split into disjoint row tiles across hosts
        (SURVEY.md §2.9): each process renders its host_image_tiles slab, the
        slabs are allgathered, and EVERY host returns the identical assembled
        frame (callers gate file IO on process 0 as usual). Single-process:
        plain render_frame."""
        import numpy as np
        h, w = resolution
        pc = jax.process_count()
        if pc == 1:
            return self.render_frame(state, batch, resolution, chunk=chunk,
                                     use_learned_pose=use_learned_pose)
        from ..parallel import host_image_tiles
        lo, hi = host_image_tiles(h)
        tile = self.render_frame(state, batch, resolution, chunk=chunk,
                                 use_learned_pose=use_learned_pose,
                                 rows=(lo, hi))
        # equal-size slabs for the allgather: pad the (possibly short) last tile
        per = (h + pc - 1) // pc
        pad = per - (hi - lo)
        rgb = np.pad(tile["rgb"], ((0, pad), (0, 0), (0, 0)))
        depth = np.pad(tile["depth"], ((0, pad), (0, 0)))
        from jax.experimental import multihost_utils
        rgb_all = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(rgb))).reshape(pc * per, w, 3)[:h]
        depth_all = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(depth))).reshape(pc * per, w)[:h]
        return {"rgb": rgb_all, "depth": depth_all}

    def reprojection_pair(self, state: TrainState, batch: Dict[str, jax.Array]):
        """The photometric warp pair (rgb_pc1, rgb_pc1_proj, valid) as numpy images
        — the reference dumps these every vis_reprojection_every iterations
        (training.py:383-393). Recomputed host-side on demand."""
        import numpy as np
        mc = self.mc
        params = state.params
        img, ref_img = jnp.asarray(batch["img"]), jnp.asarray(batch["ref_img"])
        h, w, _ = img.shape
        idx, ref_idx = batch["idx"], batch["ref_idx"]
        nl = mc.nearest_limit

        c2w = pose_c2w(params["pose"], idx, mc.pose)
        c2w_ref = pose_c2w(params["pose"], ref_idx, mc.pose)
        world_mat = rigid_inverse(c2w)
        ref_Rt = rigid_inverse(c2w_ref)
        depth = jnp.asarray(batch["depth"])
        depth_ref = jnp.asarray(batch["ref_depth"])
        if mc.distortion is not None:
            s, sh_ = distortion_scale_shift(params["distortion"], idx, mc.distortion)
            depth = _apply_distortion(depth, s[0], sh_[0], mc.shift_first)
            s2, sh2 = distortion_scale_shift(params["distortion"], ref_idx,
                                             mc.distortion)
            depth_ref = _apply_distortion(depth_ref, s2[0], sh2[0], mc.shift_first)
        camera_mat = jnp.asarray(batch["camera_mat"])

        fwd = bool(idx < (mc.pose.num_cams - 1))
        d1 = depth if fwd else depth_ref
        img1 = img if fwd else ref_img
        img2 = ref_img if fwd else img
        Rt_rel = (mm_exact(ref_Rt, rigid_inverse(world_mat)) if fwd
                  else mm_exact(world_mat, rigid_inverse(ref_Rt)))

        sh_res = (h // mc.pc_ratio, w // mc.pc_ratio)
        _, p_pc = pixel_grid(sh_res, dtype=img.dtype)
        d1s = jnp.maximum(resize_nearest(d1[..., None], sh_res).reshape(-1), nl)
        pc1 = transform_to_world(p_pc, d1s[:, None], camera_mat)
        img1s = resize_bilinear(img1, sh_res)
        img2s = resize_bilinear(img2, sh_res)
        rgb_pc1 = get_tensor_values(img1s, p_pc, mode="bilinear", scale=False,
                                    align_corners=True)
        pc1_rot = mm_exact(pc1, Rt_rel[:3, :3].T) + Rt_rel[:3, 3]
        invalid = (-pc1_rot[:, 2:]) < nl
        pc1_rot = jnp.where(jnp.broadcast_to(invalid, pc1_rot.shape), nl, pc1_rot)
        p_reproj, valid = project_to_cam(pc1_rot, camera_mat)
        rgb_proj = get_tensor_values(img2s, p_reproj, mode="bilinear", scale=False,
                                     align_corners=True)
        return (np.asarray(rgb_pc1).reshape(*sh_res, 3),
                np.asarray(rgb_proj).reshape(*sh_res, 3),
                np.asarray(valid).reshape(*sh_res))

    def render_geo(self, state: TrainState, batch: Dict[str, jax.Array],
                   resolution: Tuple[int, int], chunk: int = 1024,
                   radius: float = 4.0, n_steps: int = 512):
        """Phong geometry view of the current surface (reference render_visdata's
        vis_geo branch, training.py:146-163). Returns (h, w, 3) numpy."""
        import numpy as np
        from ..ops.phong import phong_render

        h, w = resolution
        mc = self.mc
        if mc.pose is not None:
            c2w = pose_c2w(state.params["pose"], batch["idx"], mc.pose)
            world_mat = rigid_inverse(c2w)
        else:
            world_mat = rigid_inverse(batch["pose_gt"])
        camera_mat = batch["camera_mat"]
        _, pixels_all = pixel_grid((h, w))
        n = h * w
        # Never render more padding than the kernel's 8-ray tile requires: for
        # frames smaller than `chunk`, a full-chunk pad would render up to 7x
        # the frame's rays (all trimmed afterwards).
        chunk = min(chunk, -(-n // 8) * 8)
        pad = (-n) % chunk
        pixels_p = jnp.concatenate([pixels_all, jnp.zeros((pad, 2))], 0)

        geo_chunk = jax.jit(functools.partial(
            phong_render, ncfg=mc.nerf, radius=radius, n_steps=n_steps))
        rgbs = []
        for i in range(0, n + pad, chunk):
            out = geo_chunk(state.params["nerf"], pixels_p[i:i + chunk],
                            camera_mat, world_mat, None)
            rgbs.append(np.asarray(out["rgb"]))
        return np.concatenate(rgbs)[:n].reshape(h, w, 3)
