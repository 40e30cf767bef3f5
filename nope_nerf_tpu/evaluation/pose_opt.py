"""Test-time pose optimization for unseen (test) views.

Capability parity with `model/eval_pose_one_epoch.py:10-98` (Trainer_pose) and the
init-method dispatch in `evaluation/eval.py:103-117`: freeze the NeRF, fit fresh
SE(3) deltas for the eval frames with a photometric-MSE-only objective, Adam +
5-milestone halving schedule.

TPU-first: the per-frame optimization step is one jitted function reused across
frames and epochs; rays render with eval semantics (no stratified noise, eval
renormalization) exactly as the reference does (eval_pose_one_epoch.py:96-99).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..geometry.camera import camera_matrix_from_focal, pixel_grid, rigid_inverse
from ..models.intrinsics import FocalConfig, focal_fxfy
from ..models.poses import PoseConfig, init_pose_params, pose_c2w
from ..models.nerf import NerfConfig
from ..ops.render import RenderConfig, render_nope_nerf
from ..utils.metrics import mse2psnr


def init_test_poses(method: str, eval_c2ws_init: Optional[np.ndarray],
                    learned_c2ws_train: np.ndarray,
                    colmap_c2ws_train: Optional[np.ndarray],
                    sample_rate: int, n_eval: int) -> Optional[np.ndarray]:
    """Initial c2ws for test-pose optimization (evaluation/eval.py:103-117):
    'scale' / 'ate' align the colmap eval poses into the learned frame;
    'pre' seeds each test pose with its neighboring learned train pose;
    'none' starts from identity."""
    from .align import align_ate_c2b_use_a2b, align_scale_c2b_use_a2b

    if method == "scale":
        init, _ = align_scale_c2b_use_a2b(colmap_c2ws_train, learned_c2ws_train,
                                          eval_c2ws_init.copy())
        return init
    if method == "ate":
        return align_ate_c2b_use_a2b(colmap_c2ws_train, learned_c2ws_train,
                                     eval_c2ws_init)
    if method == "pre":
        return learned_c2ws_train[int(sample_rate / 2) - 1::sample_rate - 1][:n_eval]
    if method == "none":
        return None
    raise ValueError(f"unknown init method {method}")


def _pose_opt_step_impl(pose_params, opt_state, nerf_params, focal_params, img,
                        idx, camera_mat, key, lr, pcfg: PoseConfig,
                        fcfg: Optional[FocalConfig], ncfg: NerfConfig,
                        rcfg: RenderConfig, n_points: int, opt):
    h, w, _ = img.shape

    def loss_fn(pose_params, key):
        key, kray = jax.random.split(key)
        # TPU-native without-replacement draw (see training.trainer._draw_rays)
        from ..training.trainer import _draw_rays
        ray_idx = _draw_rays(kray, h * w, n_points)
        _, pixels_all = pixel_grid((h, w), dtype=img.dtype)
        pixels = pixels_all[ray_idx]
        rgb_gt = img.reshape(-1, 3)[ray_idx]
        c2w = pose_c2w(pose_params, idx, pcfg)
        world_mat = rigid_inverse(c2w)
        cam = camera_mat
        if fcfg is not None:
            fxfy = focal_fxfy(focal_params, fcfg)
            cam = camera_matrix_from_focal(fxfy[0], fxfy[1])
        out = render_nope_nerf(nerf_params, pixels,
                               jnp.ones((n_points, 1), img.dtype), cam, world_mat,
                               None, None, rcfg, ncfg, add_noise=False, eval_=True)
        return jnp.mean((out["rgb"] - rgb_gt) ** 2), key

    (loss, key), grads = jax.value_and_grad(loss_fn, has_aux=True)(pose_params, key)
    updates, opt_state = opt.update(grads, opt_state)
    pose_params = jax.tree.map(lambda p, u: p - lr * u, pose_params, updates)
    return pose_params, opt_state, loss, key


@functools.partial(jax.jit, static_argnames=("pcfg", "fcfg", "ncfg", "rcfg",
                                             "n_points", "opt", "n_eval"))
def _pose_opt_epochs(pose_params, opt_state, nerf_params, focal_params, imgs,
                     camera_mat, key, lrs, pcfg: PoseConfig,
                     fcfg: Optional[FocalConfig], ncfg: NerfConfig,
                     rcfg: RenderConfig, n_points: int, opt, n_eval: int):
    """A chunk of pose-opt epochs as ONE lax.scan dispatch (each epoch steps
    every frame sequentially, reference eval_pose_one_epoch semantics). The
    reference structure — one dispatch + host sync per frame-step — costs a
    transport round trip each; scan-fusing takes an opt_pose_epoch=1000 run
    from ~n_eval x 1000 dispatches to n_epochs/log_every."""

    def epoch_body(carry, lr_active):
        lr_e, active = lr_active
        pose_params0, opt_state0, key0 = carry

        def frame_body(i, c):
            pose_params, opt_state, key, loss_sum = c
            pose_params, opt_state, loss, key = _pose_opt_step_impl(
                pose_params, opt_state, nerf_params, focal_params, imgs[i],
                i, camera_mat, key, lr_e, pcfg, fcfg, ncfg, rcfg, n_points, opt)
            return (pose_params, opt_state, key, loss_sum + loss)

        pose_params, opt_state, key, loss_sum = jax.lax.fori_loop(
            0, n_eval, frame_body, (pose_params0, opt_state0, key0,
                                    jnp.asarray(0.0, jnp.float32)))
        # `active` masks the tail padding that keeps every scan chunk the same
        # length (uniform chunks -> ONE compilation): padded epochs are no-ops.
        sel = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(active, a, b), new, old)
        return (sel(pose_params, pose_params0), sel(opt_state, opt_state0),
                key), loss_sum / n_eval

    (pose_params, opt_state, key), losses = jax.lax.scan(
        epoch_body, (pose_params, opt_state, key), lrs)
    return pose_params, opt_state, key, losses


def optimize_test_poses(nerf_params, focal_params, eval_scene,
                        ncfg: NerfConfig, rcfg: RenderConfig,
                        init_c2ws: Optional[np.ndarray] = None,
                        fcfg: Optional[FocalConfig] = None,
                        n_points: int = 1024, n_epochs: int = 1000,
                        lr: float = 0.001, seed: int = 0,
                        log_every: int = 100) -> Tuple[Dict, np.ndarray]:
    """Optimize per-test-frame poses against the frozen NeRF. Returns
    (pose_params, learned eval c2ws (N,4,4))."""
    n_eval = eval_scene.n_frames
    pcfg = PoseConfig(num_cams=n_eval, use_init_c2w=init_c2ws is not None)
    pose_params = init_pose_params(pcfg, None if init_c2ws is None
                                   else jnp.asarray(init_c2ws))
    opt = optax.scale_by_adam()
    opt_state = opt.init(pose_params)
    key = jax.random.key(seed)

    imgs = jnp.asarray(eval_scene.imgs)
    camera_mat = jnp.asarray(eval_scene.K)
    milestones = list(range(0, n_epochs, max(n_epochs // 5, 1)))
    lrs = jnp.asarray([lr * (0.5 ** sum(1 for m in milestones if m <= e))
                       for e in range(n_epochs)], jnp.float32)

    chunk = max(1, min(log_every or n_epochs, n_epochs))
    pad = (-n_epochs) % chunk
    lrs = jnp.concatenate([lrs, jnp.zeros((pad,), jnp.float32)])
    active = jnp.arange(n_epochs + pad) < n_epochs
    for start in range(0, n_epochs + pad, chunk):
        pose_params, opt_state, key, losses = _pose_opt_epochs(
            pose_params, opt_state, nerf_params, focal_params, imgs,
            camera_mat, key,
            (lrs[start:start + chunk], active[start:start + chunk]),
            pcfg, fcfg, ncfg, rcfg, n_points, opt, n_eval)
        if log_every:
            l0 = float(losses[0])
            print(f"  pose-opt epoch {start}: L2 {l0:.4f} "
                  f"PSNR {float(mse2psnr(l0)):.2f}")

    from ..models.poses import pose_c2w_all
    c2ws = np.asarray(pose_c2w_all(pose_params, pcfg))
    return pose_params, c2ws
