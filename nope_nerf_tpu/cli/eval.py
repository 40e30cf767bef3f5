"""Image/depth evaluation CLI: `python -m nope_nerf_tpu.cli.eval <config.yaml>`.

Capability parity with `evaluation/eval.py:29-227`: loads the trained checkpoint,
initializes test poses (scale|ate|pre|none), runs test-time pose optimization,
renders each eval view full-res, aggregates PSNR/SSIM/LPIPS + the 7 depth
metrics + the validity confusion matrix into `extraction/evaluation.txt`, and
writes the full per-view artifact set (img/depth/disp/mask pngs, first-view
depth-error scatter, eval video) via evaluation/artifacts.py.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

logger_py = logging.getLogger(__name__)


def evaluate(cfg: dict, synthetic: bool = False):
    import jax
    import jax.numpy as jnp

    from ..data import DataField, SceneData, make_synthetic_scene
    from ..evaluation.artifacts import write_eval_video, write_view_artifacts
    from ..evaluation.image_eval import aggregate_depth_errors, eval_image
    from ..evaluation.pose_opt import init_test_poses, optimize_test_poses
    from ..models.poses import pose_c2w_all
    from ..training import ModelConfigs, Trainer, create_train_state
    from ..training.checkpoints import load_checkpoint

    out_dir = cfg["training"]["out_dir"]
    extraction_dir = os.path.join(out_dir, cfg["extract_images"]["extraction_dir"])
    os.makedirs(extraction_dir, exist_ok=True)

    from ..evaluation.lpips import set_lpips_weights
    set_lpips_weights(cfg["extract_images"].get("lpips_weights"))

    if synthetic:
        full = dict(make_synthetic_scene(n_frames=8, h=120, w=160))
        ids = np.arange(8)
        i_test = ids[4::8]
        i_train = np.array([i for i in ids if i not in i_test])
        train_scene = SceneData.from_dict(
            {k: (v[i_train] if k != "K" else v) for k, v in full.items()})
        eval_scene = SceneData.from_dict(
            {k: (v[i_test] if k != "K" else v) for k, v in full.items()})
        sample_rate = 8
    else:
        train_field = DataField.from_cfg(cfg, mode="train")
        eval_field = DataField.from_cfg(cfg, mode="eval")
        train_scene, eval_scene = train_field.scene, eval_field.scene
        sample_rate = cfg["dataloading"]["sample_rate"]

    mc = ModelConfigs.from_cfg(cfg, num_cams=train_scene.n_frames)
    state, optimizers = create_train_state(jax.random.key(0), mc,
                                           init_c2w=jnp.asarray(train_scene.c2ws_gt)
                                           if cfg["pose"]["init_pose"] else None)
    loaded = load_checkpoint(out_dir, cfg["training"]["load_dir"], state,
                             load_model_only=True)
    if loaded is None:
        raise FileNotFoundError(f"no checkpoint in {out_dir}")
    state, _ = loaded

    learned_train = np.asarray(pose_c2w_all(state.params["pose"], mc.pose)) \
        if mc.pose is not None else np.asarray(train_scene.c2ws_gt)

    if cfg["eval_pose"]["type_to_eval"] == "train":
        # evaluate on TRAIN views with the learned poses directly
        # (reference evaluation/eval.py:98-101) — no test-pose optimization
        eval_scene = train_scene
        eval_c2ws = learned_train
    else:
        # test views: init + optimize fresh poses against the frozen NeRF
        init_method = cfg["eval_pose"]["init_method"]
        init_c2ws = init_test_poses(
            init_method,
            eval_scene.c2ws_init if eval_scene.c2ws_init is not None
            else eval_scene.c2ws_gt,
            learned_train,
            train_scene.c2ws_init if train_scene.c2ws_init is not None
            else train_scene.c2ws_gt,
            sample_rate, eval_scene.n_frames)

        focal_params = state.params.get("focal")
        _, eval_c2ws = optimize_test_poses(
            state.params["nerf"], focal_params, eval_scene, mc.nerf, mc.render,
            init_c2ws=init_c2ws, fcfg=mc.focal,
            n_points=cfg["eval_pose"]["n_points"],
            n_epochs=cfg["eval_pose"]["opt_pose_epoch"],
            lr=cfg["eval_pose"]["opt_eval_lr"])

    # render + evaluate each view
    trainer = Trainer(cfg, mc, optimizers)
    h, w = eval_scene.imgs.shape[1:3]
    sc = 1.0
    if eval_scene.reverse is not None:
        # depth -> metric scale ratio (evaluation/eval.py:171-175)
        sc = 1.0 / eval_scene.reverse["sc"]
        if eval_scene.reverse.get("sc_spherify") is not None:
            sc /= eval_scene.reverse["sc_spherify"]

    results = []
    video_frames = []
    min_d, max_d = cfg["eval_pose"]["depth_range"]

    def eval_view(i, out):
        gt_depth = (eval_scene.gt_depths[i] if eval_scene.gt_depths is not None
                    else None)
        r = eval_image(out["rgb"], eval_scene.imgs[i], out["depth"], gt_depth,
                       sc=sc, min_depth=min_d, max_depth=max_d)
        results.append(r)
        print(f"{i:4d} img: PSNR {r['psnr']:.2f} SSIM {r['ssim']:.3f} "
              f"LPIPS {r['lpips'] if r['lpips'] is not None else 'n/a'}")
        # per-view artifact set (model/eval_images.py:109-198); the depth-error
        # scatter only for the first view, matching eval.py:179 show_errors=first
        video_frames.append(write_view_artifacts(
            extraction_dir, i, np.asarray(out["rgb"]), eval_scene.imgs[i],
            depth_out=r.get("depth_out_full"), depth_gt=gt_depth,
            min_depth=min_d, max_depth=max_d, show_errors=(i == 0)))

    # depth-2 pipeline: frame i+1's render is dispatched before frame i's
    # host readback + metrics, hiding the transport round-trip
    pending = None
    for i in range(eval_scene.n_frames):
        batch = {
            "img": eval_scene.imgs[i], "depth": np.ones((h, w), np.float32),
            "depth_mask": np.ones((h, w), bool), "camera_mat": eval_scene.K,
            "pose_gt": eval_c2ws[i].astype(np.float32), "idx": np.int32(i),
        }
        out_dev = trainer.render_frame(state, batch, (h, w),
                                       use_learned_pose=False, sync=False)
        if pending is not None:
            eval_view(i - 1, trainer.finalize_frame(pending))
        pending = out_dev
    if pending is not None:
        eval_view(eval_scene.n_frames - 1, trainer.finalize_frame(pending))

    summary = {
        "mean_mse": float(np.mean([r["mse"] for r in results])),
        "mean_psnr": float(np.mean([r["psnr"] for r in results])),
        "mean_ssim": float(np.mean([r["ssim"] for r in results])),
    }
    if all(r.get("lpips") is not None for r in results):
        summary["mean_lpips"] = float(np.mean([r["lpips"] for r in results]))
    if all("depth_pred_masked" in r for r in results):
        summary.update(aggregate_depth_errors(results))
        conf = np.sum([r["conf_mat"] for r in results], axis=0) / len(results)
        summary["conf_mat"] = conf.tolist()

    # evaluation.txt in the reference's format (evaluation/eval.py:215-221)
    with open(os.path.join(extraction_dir, "evaluation.txt"), "a") as f:
        f.write("Mean MSE: {0:.2f}, PSNR: {1:.2f}, SSIM: {2:.2f}, LPIPS {3}\n"
                .format(summary["mean_mse"], summary["mean_psnr"],
                        summary["mean_ssim"],
                        "{0:.2f}".format(summary["mean_lpips"])
                        if "mean_lpips" in summary else "n/a"))
        if "abs_rel" in summary:
            names = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")
            f.write(("{:>8} | " * 7).format(*names) + "\n")
            f.write(("&{: 8.3f}  " * 7).format(
                *[summary[k] for k in names]) + "\\\\\n")
            c = summary["conf_mat"]
            f.write(f"\ntp: {c[0][0]}, fn: {c[0][1]}, "
                    f"fp: {c[1][0]}, tn: {c[1][1]}\n")
        f.write("\n-> Done!\n")

    if video_frames:
        write_eval_video(extraction_dir, video_frames)
    print(summary)
    return summary


def main():
    parser = argparse.ArgumentParser(description="Evaluate image/depth quality")
    parser.add_argument("config", nargs="?", default=None)
    parser.add_argument("--synthetic", action="store_true")
    args = parser.parse_args()
    from ..config import load_config
    cfg = load_config(args.config)
    evaluate(cfg, synthetic=args.synthetic)


if __name__ == "__main__":
    main()
