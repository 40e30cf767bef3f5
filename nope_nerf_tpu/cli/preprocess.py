"""Depth-prior preprocessing CLI: run the frozen DPT over every frame of a scene and
save `dpt/depth_<frame>.npz` (+ preview pngs).

Capability parity with `preprocess/dpt_depth.py:13-46`. The DPT weights come from
either a converted .npz or the original torch .pt (see models/dpt.load_dpt);
`--random-weights` runs the architecture with random weights for pipeline smoke
tests when no checkpoint is present.

Usage: python -m nope_nerf_tpu.cli.preprocess <config.yaml> [--random-weights]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def preprocess(cfg: dict, random_weights: bool = False, scene=None):
    import cv2
    import jax

    from ..data import DataField
    from ..data.dpt_transforms import prepare_dpt_input
    from ..models.dpt import DPTConfig, dpt_apply, init_dpt_params, load_dpt

    dcfg = DPTConfig.from_cfg(cfg)
    if random_weights:
        params = init_dpt_params(jax.random.key(0), dcfg)
    else:
        params, dcfg = load_dpt(cfg["depth"]["path"], dcfg)

    if scene is None:
        field = DataField.from_cfg(cfg, mode="all")
        scene = field.scene
        img_list = field.img_list
        out_dir = os.path.join(field.load_dir, cfg["dataloading"]["depth_net"])
    else:  # injected scene (tests)
        img_list = [f"{i:04d}.png" for i in range(scene.n_frames)]
        out_dir = cfg["dataloading"]["path"]
    os.makedirs(out_dir, exist_ok=True)

    apply_jit = jax.jit(lambda p, x: dpt_apply(p, x, dcfg))
    for i in range(scene.n_frames):
        img = scene.imgs[i]
        inp = prepare_dpt_input(img)
        depth = np.asarray(apply_jit(params, inp[None]))[0]
        frame_id = img_list[i].split(".")[0]
        np.savez(os.path.join(out_dir, f"depth_{frame_id}.npz"),
                 pred=depth.astype(np.float32))
        vis = np.clip(255.0 / max(depth.max(), 1e-6) * (depth - depth.min()),
                      0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, f"depth_{frame_id}.png"), vis)
        print(f"  {frame_id}: depth {depth.shape} "
              f"[{depth.min():.3f}, {depth.max():.3f}]")
    print(f"wrote {scene.n_frames} depth priors to {out_dir}")
    return out_dir


def main():
    parser = argparse.ArgumentParser(description="Precompute DPT depth priors")
    parser.add_argument("config", nargs="?", default=None)
    parser.add_argument("--random-weights", action="store_true",
                        help="run with random DPT weights (no checkpoint needed)")
    args = parser.parse_args()
    from ..config import load_config
    cfg = load_config(args.config)
    preprocess(cfg, random_weights=args.random_weights)


if __name__ == "__main__":
    main()
