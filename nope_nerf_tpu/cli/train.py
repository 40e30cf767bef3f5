"""Training CLI: `python -m nope_nerf_tpu.cli.train <config.yaml> [--synthetic]`.

Capability parity with the reference's `train.py:19-370`: config merge + source
backup, checkpoint resume with scheduler scalars, the epoch loop with per-iteration
logging, periodic checkpoint/backup/visualization, per-epoch train-pose ATE/RPE and
PSNR, and both scheduler modes (explicit MultiStepLR-style or PSNR-plateau auto).
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import time
from typing import Optional

import numpy as np

logger_py = logging.getLogger(__name__)


BEST_CKPT_WRITE_EVERY = 25   # epochs between model_best.ckpt disk writes


def backup(out_dir: str, config_path: Optional[str],
           snapshot_source: bool = True) -> None:
    """Config + source snapshot into out_dir/backup (reference `backup`,
    common.py:492-506: it copies train.py, configs/default.yaml, model/ and
    dataloading/; here the whole nope_nerf_tpu package is snapshotted so a run
    directory is self-describing even when the working tree moves on)."""
    backup_path = os.path.join(out_dir, "backup")
    os.makedirs(backup_path, exist_ok=True)
    if config_path and os.path.exists(config_path):
        shutil.copyfile(config_path, os.path.join(backup_path, "config.yaml"))
    if snapshot_source:
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dest = os.path.join(backup_path, os.path.basename(pkg_root))
        shutil.copytree(pkg_root, dest, dirs_exist_ok=True,
                        ignore=shutil.ignore_patterns("__pycache__", "*.pyc"))


def build_scene(cfg: dict, synthetic: bool):
    if synthetic:
        from ..data import SceneData, make_synthetic_scene
        return SceneData.from_dict(dict(make_synthetic_scene(
            n_frames=8, h=120, w=160)))
    from ..data import DataField
    return DataField.from_cfg(cfg, mode=cfg["training"]["mode"]).scene


def train(cfg: dict, synthetic: bool = False, max_epochs: Optional[int] = None):
    import jax
    import jax.numpy as jnp

    from ..evaluation.pose_eval import full_pose_evaluation
    from ..models.poses import pose_c2w_all
    from ..parallel import make_mesh
    from ..training import ModelConfigs, Trainer, create_train_state
    from ..training.checkpoints import load_checkpoint, save_checkpoint
    from ..training.scheduler import AutoScheduler
    from ..utils.metrics import mse2psnr

    t_cfg = cfg["training"]
    out_dir = t_cfg["out_dir"]
    os.makedirs(out_dir, exist_ok=True)
    render_path = os.path.join(out_dir, "rendering")
    os.makedirs(render_path, exist_ok=True)

    seed = cfg["tpu"]["seed"]
    np.random.seed(seed)

    scene = build_scene(cfg, synthetic)
    n_views = scene.n_frames

    if cfg["dataloading"]["show_pose_only"]:
        # Pose-loading sanity check (reference dataset.py:114-127): draw the
        # preprocessed pose frustums and exit without training.
        from .vis_poses import draw_poses
        h_img, w_img = scene.imgs.shape[1:3]
        fx = float(scene.K[0, 0]) * w_img / 2.0
        fy = float(-scene.K[1, 1]) * h_img / 2.0
        c2ws_list = [np.asarray(scene.c2ws_gt)]
        colors, labels = ["tab:blue"], ["preprocessed (gt/llff)"]
        if scene.c2ws_init is not None:
            c2ws_list.append(np.asarray(scene.c2ws_init))
            colors.append("tab:orange")
            labels.append("init (colmap)")
        out_path = os.path.join(out_dir, "pose_check.png")
        draw_poses(c2ws_list, colors, labels, h_img, w_img, fx, fy, out_path)
        print(f"show_pose_only: wrote {out_path}; exiting without training")
        return out_path

    scene = scene.to_device()  # one-time upload; steps gather on device
    mc = ModelConfigs.from_cfg(cfg, num_cams=n_views)

    init_c2w = None
    if cfg["pose"]["learn_pose"] and cfg["pose"]["init_pose"]:
        src = (scene.c2ws_gt if cfg["pose"]["init_pose_type"] == "gt"
               else scene.c2ws_init)
        if src is None:
            # Synthetic scenes have no COLMAP reconstruction by construction, so
            # GT init is the only option. On a real scene a missing init is a
            # config error — silently substituting GT would make a pose-
            # refinement experiment (d7/d8-style) trivially degenerate.
            if not synthetic:
                raise ValueError(
                    "pose.init_pose_type=colmap but the scene has no COLMAP "
                    "poses (dataloading.load_colmap_poses is off?); set "
                    "init_pose_type=gt explicitly if GT init is intended")
            print("synthetic scene: init_pose_type=colmap falls back to GT init")
            src = scene.c2ws_gt
        init_c2w = jnp.asarray(src)
    init_focal = None
    if cfg["pose"]["learn_focal"] and cfg["pose"]["init_focal_type"] == "gt":
        init_focal = [float(scene.K[0, 0]), float(-scene.K[1, 1])]

    state, optimizers = create_train_state(jax.random.key(seed), mc,
                                           init_c2w=init_c2w,
                                           init_focal=init_focal)

    mesh = None
    if cfg["tpu"]["mesh_shape"]:
        mesh = make_mesh(int(np.prod(cfg["tpu"]["mesh_shape"])))
    trainer = Trainer(cfg, mc, optimizers, mesh=mesh)

    # resume
    epoch_it, it = -1, -1
    psnr_best = float("-inf")
    best_held = None          # (state, scalars) device refs awaiting a write
    best_written_at = -10**9
    scheduling_start = t_cfg["scheduling_start"]
    auto = AutoScheduler(length_smooth=t_cfg["length_smooth"],
                         patient=t_cfg["patient"])
    loaded = load_checkpoint(out_dir, t_cfg["load_dir"], state,
                             load_model_only=t_cfg["load_ckpt_model_only"])
    if loaded is not None:
        state, scalars = loaded
        epoch_it = scalars.get("epoch_it", -1)
        it = int(state.it)
        scheduling_start = scalars.get("scheduling_start", scheduling_start)
        psnr_best = scalars.get("psnr_best", psnr_best)
        auto.load_state_dict(scalars)
        if scalars.get("occ_grid") is not None:
            # resume the EMA occupancy grid — rebuilding from all-ones would
            # make a resumed run sample differently for dozens of epochs
            # (no-op if the current config disabled occupancy)
            trainer.set_occupancy_grid(scalars["occ_grid"])
        print(f"resumed from {t_cfg['load_dir']} at epoch {epoch_it}, it {it}")

    def ckpt_scalars(ep, sched_start):
        sc = {"epoch_it": ep, "scheduling_start": sched_start,
              "psnr_best": psnr_best, **auto.state_dict()}
        if trainer.occ_grid is not None:
            sc["occ_grid"] = np.asarray(trainer.occ_grid)
        return sc

    try:
        from torch.utils.tensorboard import SummaryWriter
        writer = SummaryWriter(os.path.join(out_dir, "logs"))
    except Exception:
        writer = None

    nparams = sum(int(np.prod(p.shape)) for p in
                  jax.tree_util.tree_leaves(state.params))
    print(f"total parameters: {nparams}")

    scheduling_epoch = t_cfg["scheduling_epoch"]
    print_every = t_cfg["print_every"]
    validate_every = t_cfg["validate_every"]
    checkpoint_every = t_cfg["checkpoint_every"]
    backup_every = t_cfg["backup_every"]
    visualize_every = t_cfg["visualize_every"]
    eval_pose_every = t_cfg["eval_pose_every"]
    eval_img_every = t_cfg["eval_img_every"]

    from ..data import batch_for_frame, epoch_order, frame_iterator
    from ..utils.profiling import StepTimer, profile_trace
    vis_batch = batch_for_frame(scene, 0, rng=np.random.RandomState(seed))
    timer = StepTimer(rays_per_step=t_cfg["n_training_points"])
    log_scale_shift = t_cfg["log_scale_shift_per_view"]
    vis_reproj_every = t_cfg["vis_reprojection_every"]
    # Scan-fused stepping: the whole epoch runs as one lax.scan dispatch
    # (trainer.run_steps). Numerically identical to per-step dispatch (tested);
    # per-it print/TB logs keep their exact per-step values from the stacked
    # metrics, while side-effect hooks (vis/validate/ckpt/backup/reproj) whose
    # boundary falls inside an epoch fire at that epoch's end.
    scan_steps = bool(cfg["tpu"].get("scan_steps", True))

    def run_it_hooks(itj: int, st, get_ld, frame_idx: int, ref_idx: int):
        """Fire the per-iteration hooks for global step `itj`. get_ld() returns
        this step's metrics as floats (lazy: only the print hook pays for it)."""
        nonlocal t0b
        if print_every > 0 and itj % print_every == 0:
            ld = get_ld()
            print(f"[Epoch {epoch_it:02d}] it={itj:03d}, loss={ld['loss']:.8f}, "
                  f"time={time.time() - t0b:.4f} ({timer.summary()})")
            t0b = time.time()
            if writer:
                for k, v in ld.items():
                    writer.add_scalar(f"train/{k}", v, itj)
                writer.add_scalar("perf/rays_per_s", timer.rays_per_s, itj)
                if log_scale_shift:
                    writer.add_scalar(f"train/scale_view{frame_idx:02d}",
                                      ld["scale"], itj)
                    writer.add_scalar(f"train/shift_view{frame_idx:02d}",
                                      ld["shift"], itj)

        if visualize_every > 0 and itj % visualize_every == 0:
            out = trainer.render_frame(st, vis_batch,
                                       tuple(t_cfg["vis_resolution"]))
            vis_dir = os.path.join(render_path, f"{itj:04d}_vis")
            os.makedirs(vis_dir, exist_ok=True)
            import imageio
            imageio.imwrite(os.path.join(vis_dir, "rgb.png"),
                            (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8))
            d = out["depth"]
            imageio.imwrite(
                os.path.join(vis_dir, "depth.png"),
                np.clip(255.0 / max(d.max(), 1e-6) * (d - d.min()), 0,
                        255).astype(np.uint8))
            if t_cfg["vis_geo"]:
                # phong geometry view (reference render_visdata's vis_geo
                # branch, training.py:146-163)
                geo = trainer.render_geo(st, vis_batch,
                                         tuple(t_cfg["vis_resolution"]),
                                         radius=cfg["rendering"]["radius"])
                imageio.imwrite(os.path.join(vis_dir, "geo.png"),
                                (np.clip(geo, 0, 1) * 255).astype(np.uint8))

        if validate_every > 0 and itj % validate_every == 0:
            # render the held-out vis frame and log PSNR (reference
            # Trainer.evaluate via validate_every, train.py:245-249)
            from ..evaluation.image_eval import eval_image
            h_v, w_v = np.asarray(vis_batch["img"]).shape[:2]
            out_v = trainer.render_frame(st, vis_batch, (h_v, w_v))
            r = eval_image(out_v["rgb"], np.asarray(vis_batch["img"]),
                           with_lpips=False)
            print(f"  val: PSNR {r['psnr']:.2f} SSIM {r['ssim']:.3f}")
            if writer:
                writer.add_scalar("val/psnr", r["psnr"], itj)
                writer.add_scalar("val/ssim", r["ssim"], itj)

        if (vis_reproj_every > 0 and itj % vis_reproj_every == 0
                and mc.pose is not None
                and (mc.loss.use_pc or mc.loss.use_rgb_s)):
            import imageio
            batch = batch_for_frame(scene, frame_idx, ref_idx=ref_idx)
            a, b, _ = trainer.reprojection_pair(st, batch)
            imageio.imwrite(
                os.path.join(render_path, f"{itj}_{frame_idx:04d}_img1.png"),
                (np.clip(a, 0, 1) * 255).astype(np.uint8))
            imageio.imwrite(
                os.path.join(render_path, f"{itj}_{frame_idx:04d}_img2.png"),
                (np.clip(b, 0, 1) * 255).astype(np.uint8))

        if checkpoint_every > 0 and itj % checkpoint_every == 0:
            save_checkpoint(out_dir, t_cfg["load_dir"], st,
                            ckpt_scalars(epoch_it, scheduling_start))
        if backup_every > 0 and itj % backup_every == 0:
            save_checkpoint(out_dir, f"model_{itj}.ckpt", st,
                            ckpt_scalars(epoch_it, scheduling_start))

    t0b = time.time()
    psnr = 0.0
    epoch_at_start = epoch_it
    try:
        while epoch_it < (scheduling_start + scheduling_epoch):
            epoch_it += 1
            if max_epochs is not None and epoch_it >= max_epochs:
                # epoch_it now names an epoch that will NOT run — roll it back so
                # the final checkpoint records the last COMPLETED epoch (otherwise
                # a resumed run silently skips one epoch).
                epoch_it -= 1
                if epoch_it == epoch_at_start:  # resumed past max_epochs:
                    print(f"checkpoint is already at epoch {epoch_it} >= "
                          f"--max-epochs {max_epochs}; nothing to train "
                          f"(delete {out_dir} or raise --max-epochs to rerun)")
                break
            l2_epoch = []
            trainer.update_occupancy(state, epoch_it)  # no-op unless enabled
            if scan_steps:
                order, refs = epoch_order(scene.n_frames,
                                          shuffle=cfg["dataloading"]["shuffle"],
                                          random_ref=cfg["dataloading"]["random_ref"],
                                          seed=seed + epoch_it)
                state, lds = trainer.run_steps(state, scene, order, refs, epoch_it,
                                               scheduling_start)
                # One scalar readback per epoch so the throughput meter measures
                # device completion, not async dispatch (block_until_ready is not
                # reliable on every transport).
                last_loss = float(lds["loss"][-1])
                timer.tick_many(len(order))
                l2_epoch.append(lds["l2_mean"])
                lds_np = None  # one bulk transfer, only if some hook needs it
                for j, (fidx, ridx) in enumerate(zip(order, refs)):
                    it += 1

                    def get_ld(j=j):
                        nonlocal lds_np
                        if lds_np is None:
                            lds_np = {k: np.asarray(v) for k, v in lds.items()}
                        return {k: float(v[j]) for k, v in lds_np.items()}

                    run_it_hooks(it, state, get_ld, int(fidx), int(ridx))
            else:
                for batch in frame_iterator(scene,
                                            shuffle=cfg["dataloading"]["shuffle"],
                                            random_ref=cfg["dataloading"]["random_ref"],
                                            seed=seed + epoch_it):
                    it += 1
                    state, ld = trainer.step(state, batch, epoch_it, scheduling_start)
                    timer.tick()
                    # keep the scalar ON DEVICE: a float() here would synchronously
                    # round-trip the transport every step; the epoch mean reads back
                    # once below
                    l2_epoch.append(ld["l2_mean"])
                    run_it_hooks(it, state,
                                 lambda ld=ld: {k: float(v) for k, v in ld.items()},
                                 int(batch["idx"]), int(batch["ref_idx"]))
                last_loss = float(ld["loss"])

            if not np.isfinite(last_loss):
                # Divergence guard: the reference breakpoint()s on a NaN loss
                # (losses.py:213-214) — useless unattended. Abort loudly instead;
                # the last periodic checkpoint predates the epoch that diverged.
                raise FloatingPointError(
                    f"non-finite loss ({last_loss}) at epoch {epoch_it}, it {it}; "
                    f"training aborted. Last good checkpoint: "
                    f"{os.path.join(out_dir, t_cfg['load_dir'])}")

            if eval_pose_every > 0 and epoch_it % eval_pose_every == 0 and mc.pose:
                learned = np.asarray(pose_c2w_all(state.params["pose"], mc.pose))
                metrics = full_pose_evaluation(learned, np.asarray(scene.c2ws_gt))
                print(f"{epoch_it:6d} ep: ATE_t {metrics['ate_trans']:.4f} "
                      f"ATE_r {metrics['ate_r_v2_deg']:.3f}deg "
                      f"RPE_r {metrics['rpe_rot_deg']:.3f}deg")
                if writer:
                    for k, v in metrics.items():
                        writer.add_scalar(f"eval/{k}", v, it)

            if eval_img_every > 0 and epoch_it % eval_img_every == 0:
                psnr = float(mse2psnr(float(jnp.mean(jnp.stack(l2_epoch)))))
                print(f"{epoch_it:6d} ep: Train PSNR {psnr:.3f}")
                if writer:
                    writer.add_scalar("train/psnr", psnr, it)
                if psnr > psnr_best:
                    # best-PSNR checkpoint (the reference's unused helper,
                    # model/checkpoints.py:43-53 — implemented here for real).
                    # Hold the best state as a DEVICE reference (free: states are
                    # immutable pytrees) and write it to disk at most every
                    # BEST_CKPT_WRITE_EVERY epochs: the write device_gets ~90
                    # small arrays, which costs seconds per epoch over a remote
                    # device transport while PSNR improves every epoch.
                    psnr_best = psnr
                    best_held = (state, ckpt_scalars(epoch_it, scheduling_start))
                if best_held is not None and (
                        epoch_it - best_written_at >= BEST_CKPT_WRITE_EVERY):
                    save_checkpoint(out_dir, "model_best.ckpt", *best_held)
                    best_held, best_written_at = None, epoch_it

            if t_cfg["auto_scheduler"]:
                scheduling_start = auto.update(psnr, epoch_it, scheduling_start)

            if (t_cfg["scheduling_mode"] == "reset"
                    and epoch_it == scheduling_start):
                # re-initialize every Linear at decay start (reference train.py:347-350)
                from ..models.nerf import reset_linear_params
                params = dict(state.params)
                params["nerf"] = reset_linear_params(
                    jax.random.fold_in(jax.random.key(seed), epoch_it),
                    state.params["nerf"], mc.nerf)
                state = type(state)(params=params, opt_state=state.opt_state,
                                    it=state.it, rng=state.rng)
                # the EMA grid describes the OLD field; start it fresh so the
                # sampler doesn't chase obsolete geometry for ~1/(1-decay) epochs
                trainer.reset_occupancy()
                print(f"scheduling_mode=reset: re-initialized NeRF at epoch {epoch_it}")
    finally:
        # flush the held best-PSNR state on ANY exit — divergence abort,
        # KeyboardInterrupt, crash — not just normal completion (the held
        # device reference is exactly the state model_best.ckpt exists for)
        if best_held is not None:
            save_checkpoint(out_dir, "model_best.ckpt", *best_held)

    save_checkpoint(out_dir, t_cfg["load_dir"], state,
                    ckpt_scalars(epoch_it, scheduling_start))
    return state, trainer, scene


def main():
    parser = argparse.ArgumentParser(description="Train a nope-nerf-tpu model")
    parser.add_argument("config", nargs="?", default=None,
                        help="scene config yaml (merged over defaults)")
    parser.add_argument("--synthetic", action="store_true",
                        help="train on the built-in synthetic scene")
    parser.add_argument("--max-epochs", type=int, default=None)
    args = parser.parse_args()

    from ..config import load_config
    cfg = load_config(args.config)
    backup(cfg["training"]["out_dir"], args.config)
    train(cfg, synthetic=args.synthetic, max_epochs=args.max_epochs)


if __name__ == "__main__":
    main()
