"""Novel-view rendering CLI: `python -m nope_nerf_tpu.cli.render <config.yaml>`.

Capability parity with `vis/render.py`: loads checkpoint + learned poses, builds the
requested novel trajectory ('interp' | 'bspline' | 'sprial'/'spiral'), renders
RGB/depth/disparity per view and writes pngs + mp4s under extraction/.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def render(cfg: dict, synthetic: bool = False):
    import jax
    import jax.numpy as jnp

    from ..data import DataField, SceneData, make_synthetic_scene
    from ..evaluation.extract import (
        generate_spiral_nerf, interp_poses, interp_poses_bspline,
        render_trajectory,
    )
    from ..models.poses import pose_c2w_all
    from ..training import ModelConfigs, create_train_state
    from ..training.checkpoints import load_checkpoint

    out_dir = cfg["training"]["out_dir"]
    extraction_dir = os.path.join(out_dir, cfg["extract_images"]["extraction_dir"])
    os.makedirs(extraction_dir, exist_ok=True)

    if synthetic:
        scene = SceneData.from_dict(dict(make_synthetic_scene(n_frames=8,
                                                              h=120, w=160)))
    else:
        scene = DataField.from_cfg(cfg, mode="render").scene

    mc = ModelConfigs.from_cfg(cfg, num_cams=scene.n_frames)
    state, _ = create_train_state(jax.random.key(0), mc,
                                  init_c2w=jnp.asarray(scene.c2ws_gt)
                                  if cfg["pose"]["init_pose"] else None)
    loaded = load_checkpoint(out_dir, cfg["extract_images"]["model_file"], state,
                             load_model_only=True)
    if loaded is None:
        raise FileNotFoundError(f"no checkpoint in {out_dir}")
    state, _ = loaded

    if cfg["extract_images"]["use_learnt_poses"] and mc.pose is not None:
        c2ws = np.asarray(pose_c2w_all(state.params["pose"], mc.pose))
    else:
        c2ws = np.asarray(scene.c2ws_gt)

    n_novel = cfg["extract_images"]["N_novel_imgs"]
    option = cfg["extract_images"]["traj_option"]
    n = len(c2ws)
    if option == "interp":
        traj = interp_poses(c2ws, n_novel)
    elif option == "bspline":
        i_train = np.arange(n)
        traj = interp_poses_bspline(c2ws, n_novel, i_train / max(n - 1, 1),
                                    cfg["extract_images"]["bspline_degree"])
    elif option in ("sprial", "spiral"):
        h, w = scene.imgs.shape[1:3]
        hwf = np.tile(np.array([h, w, scene.K[0, 0] * w / 2], np.float32)
                      [None, :, None], (n, 1, 1))
        bds = np.array([0.5, 20.0], np.float32)
        traj = generate_spiral_nerf(c2ws, bds, n_novel, hwf)
    else:
        raise ValueError(f"unknown traj_option {option}")

    h, w = scene.imgs.shape[1:3]
    resolution = cfg["extract_images"]["resolution"] or (h, w)
    frames = render_trajectory(state.params["nerf"], traj, scene.K,
                               tuple(resolution), mc.nerf, mc.render,
                               out_dir=extraction_dir)
    print(f"rendered {len(frames)} novel views to {extraction_dir}")
    return frames


def main():
    parser = argparse.ArgumentParser(description="Render novel-view trajectory")
    parser.add_argument("config", nargs="?", default=None)
    parser.add_argument("--synthetic", action="store_true")
    args = parser.parse_args()
    from ..config import load_config
    cfg = load_config(args.config)
    render(cfg, synthetic=args.synthetic)


if __name__ == "__main__":
    main()
