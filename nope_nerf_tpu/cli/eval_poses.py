"""Trajectory evaluation CLI: `python -m nope_nerf_tpu.cli.eval_poses <config.yaml>`.

Capability parity with `evaluation/eval_poses.py:80-163`: load the learned poses,
revert the LLFF preprocessing to metric units, align by the initial pose, and report
ATE / ATE_v2 / RPE into `extraction/evaluation.txt`. The Open3D frustum viewer is
replaced by a matplotlib 3D trajectory figure (open3d is not in this image), saved
with --vis.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def evaluate_poses(cfg: dict, vis: bool = False, synthetic: bool = False):
    import jax
    import jax.numpy as jnp

    from ..data import DataField, SceneData, make_synthetic_scene
    from ..evaluation.pose_eval import full_pose_evaluation, revert_to_metric
    from ..models.poses import pose_c2w_all
    from ..training import ModelConfigs, create_train_state
    from ..training.checkpoints import load_checkpoint

    out_dir = cfg["training"]["out_dir"]
    extraction_dir = os.path.join(out_dir, cfg["eval_pose"]["extraction_dir"])
    os.makedirs(extraction_dir, exist_ok=True)

    if synthetic:
        scene = SceneData.from_dict(dict(make_synthetic_scene(n_frames=8,
                                                              h=120, w=160)))
    else:
        scene = DataField.from_cfg(cfg, mode="train").scene

    mc = ModelConfigs.from_cfg(cfg, num_cams=scene.n_frames)
    state, _ = create_train_state(jax.random.key(0), mc,
                                  init_c2w=jnp.asarray(scene.c2ws_gt)
                                  if cfg["pose"]["init_pose"] else None)
    loaded = load_checkpoint(out_dir, cfg["training"]["load_dir"], state,
                             load_model_only=True)
    if loaded is None:
        raise FileNotFoundError(f"no checkpoint in {out_dir}")
    state, _ = loaded

    learned = np.asarray(pose_c2w_all(state.params["pose"], mc.pose))
    gt = np.asarray(scene.c2ws_gt)
    metrics = full_pose_evaluation(
        learned, gt,
        reverse_est=scene.reverse, reverse_gt=scene.reverse)
    line = (f"ATE_t: {metrics['ate_trans']:.6f} m, "
            f"ATE_t_v2: {metrics['ate_t_v2']:.6f} m, "
            f"ATE_r_v2: {metrics['ate_r_v2_deg']:.4f} deg, "
            f"RPE_t: {metrics['rpe_trans'] * 100:.4f} cm, "
            f"RPE_r: {metrics['rpe_rot_deg']:.4f} deg")
    print(line)
    with open(os.path.join(extraction_dir, "evaluation.txt"), "a") as f:
        f.write(line + "\n")

    if vis:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from ..evaluation.align import align_ate_init_pose

        est_m = revert_to_metric(learned, scene.reverse) if scene.reverse else learned
        gt_m = revert_to_metric(gt, scene.reverse) if scene.reverse else gt
        est_m = align_ate_init_pose(est_m, gt_m)
        fig = plt.figure(figsize=(8, 6))
        ax = fig.add_subplot(111, projection="3d")
        ax.plot(*gt_m[:, :3, 3].T, "g-o", ms=2, label="GT")
        ax.plot(*est_m[:, :3, 3].T, "r-o", ms=2, label="learned")
        ax.legend()
        fig.savefig(os.path.join(extraction_dir, "trajectory.png"), dpi=150)
        # exportable frustum geometry alongside the static figure — the
        # information the reference's Open3D window shows
        # (evaluation/eval_poses.py:166-315)
        from .vis_poses import write_frustums_ply
        h_img, w_img = scene.imgs.shape[1:3]
        fx = float(scene.K[0, 0]) * w_img / 2.0
        fy = float(-scene.K[1, 1]) * h_img / 2.0
        ply = write_frustums_ply([gt_m, est_m], ["green", "red"], h_img, w_img,
                                 fx, fy,
                                 os.path.join(extraction_dir, "trajectory.ply"))
        print(f"saved {extraction_dir}/trajectory.png and {ply}")
    return metrics


def main():
    parser = argparse.ArgumentParser(description="Evaluate learned camera poses")
    parser.add_argument("config", nargs="?", default=None)
    parser.add_argument("--vis", action="store_true")
    parser.add_argument("--synthetic", action="store_true")
    args = parser.parse_args()
    from ..config import load_config
    cfg = load_config(args.config)
    evaluate_poses(cfg, vis=args.vis, synthetic=args.synthetic)


if __name__ == "__main__":
    main()
