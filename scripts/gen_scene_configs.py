"""Generate the full scene-config experiment matrix into configs/.

The reference ships ~60 hand-written scene yamls (reference configs/: 42 V_KITTI
depth-supervision variants d1-d14 x {straight, t_junction, intersection} plus 6
preprocess yamls, 8 Tanks-and-Temples scenes, LLFF fern, and 2 Test-demo configs).
This script emits the equivalent experiment matrix in this framework's schema
(keys are name-compatible; see nope_nerf_tpu/config.py DEFAULTS) so the whole
option surface is exercised from config files alone.

Variant semantics (reference configs/V_KITTI/<scene>_dN.yaml):
  d1  dense GT depth, frozen COLMAP-init poses, fixed (non-auto) schedule
  d2  no depth prior, frozen poses, auto-scheduler
  d3  dense GT depth, distortion scale/shift frozen, auto-scheduler
  d4  d3 with sparsified depth, retain pattern [1,3,1,3]  (~25% of pixels)
  d5  d3 with sparsified depth, retain pattern [1,9,1,9]  (~1%)
  d6  d3 with sparsified depth, retain pattern [1,19,1,19] (~0.25%)
  d7  no depth prior, learned poses (R+t)
  d8  dense GT depth, learned poses, scale/shift frozen
  d9  d8 + transform-cycle loss (t_cycle_weight 1 -> 0)
  d10-d14 = d1/d2/d3/d7/d8 on the <scene>_colmap reconstruction variant

Run:  python scripts/gen_scene_configs.py [--config-dir configs]
"""

from __future__ import annotations

import argparse
import os

import yaml

VKITTI_SCENES = ["straight", "t_junction", "intersection"]
TANKS_SCENES = ["Ballroom", "Barn", "Church", "Family",
                "Francis", "Horse", "Ignatius", "Museum"]

SPARSIFY = {4: [1, 3, 1, 3], 5: [1, 9, 1, 9], 6: [1, 19, 1, 19]}
# variants where the depth prior is the (degraded) V-KITTI GT depth
WITH_DEPTH = {1, 3, 4, 5, 6, 8, 9, 10, 12, 14}
# variants where camera poses are optimized (otherwise frozen at their init)
LEARN_POSE = {7, 8, 9, 13, 14}
# variants where the per-frame depth scale/shift distortion params are frozen
FREEZE_DISTORTION = {3, 4, 5, 6, 8, 9, 12, 14}
# variants on the COLMAP-reconstruction copy of the scene
COLMAP_SCENE = {10, 11, 12, 13, 14}
# d1 and its colmap twin d10 run the fixed (non-auto) lr schedule
FIXED_SCHEDULE = {1, 10}


def vkitti_variant(scene: str, d: int) -> dict:
    """One reference <scene>_dN.yaml experiment, in this framework's schema."""
    scene_dir = f"{scene}_colmap" if d in COLMAP_SCENE else scene
    cfg = {
        "dataloading": {
            "path": "data/V_KITTI",
            "scene": [scene_dir],
            "resize_factor": 2,
            "customized_focal": True,   # K from get_vkitti, not COLMAP
            "customized_poses": False,
            "load_colmap_poses": True,
            "random_ref": 1,            # reference frame = next frame
        },
        "depth": {"type": None},        # prior comes from GT pngs, not DPT
        "pose": {
            "learn_pose": True,
            "init_pose": True,
            "init_pose_type": "colmap",
            "init_R_only": False,
            "learn_R": d in LEARN_POSE,
            "learn_t": d in LEARN_POSE,
            "learn_focal": False,
            "update_focal": True,
        },
        "distortion": {"learn_distortion": True},
        "training": {
            "out_dir": f"out/V_KITTI/{scene}_d{d}",
            "depth_loss_type": "l1",
            "match_method": "dense",
            "with_ssim": False,
            "auto_scheduler": d not in FIXED_SCHEDULE,
        },
        "extract_images": {
            "resolution": [188, 621],
            "eval_depth": True,
            "traj_option": "interp",
            "bspline_degree": 100,
        },
    }
    if d in WITH_DEPTH:
        cfg["dataloading"]["with_depth"] = True
        cfg["dataloading"]["depth_scale"] = 0.01  # V-KITTI depth pngs are cm
    if d in SPARSIFY:
        cfg["dataloading"]["sparsify_depth"] = True
        cfg["dataloading"]["sparsify_depth_pattern"] = SPARSIFY[d]
    if d in FREEZE_DISTORTION:
        cfg["distortion"]["learn_scale"] = False
        cfg["distortion"]["learn_shift"] = False
    if d in FIXED_SCHEDULE:
        cfg["training"].update(scheduling_start=0, annealing_epochs=0)
    if d == 9:
        cfg["training"]["t_cycle_weight"] = [1.0, 0.0]
    return cfg


def vkitti_preprocess(scene: str, colmap: bool) -> dict:
    scene_dir = f"{scene}_colmap" if colmap else scene
    return {
        "dataloading": {
            "path": "data/V_KITTI",
            "scene": [scene_dir],
            "resize_factor": 2,
            "customized_focal": True,
            "customized_poses": False,
            "load_colmap_poses": True,
        },
        "depth": {"type": "DPT"},
        "training": {"mode": "all"},
    }


def tanks(scene: str) -> dict:
    return {
        "dataloading": {
            "path": "data/Tanks",
            "scene": [scene],
            "customized_focal": False,  # focal from COLMAP poses_bounds
            "random_ref": 1,
        },
        "depth": {"type": None},
        "pose": {"learn_pose": True},
        "training": {
            "out_dir": f"out/Tanks/{scene}",
            "auto_scheduler": True,
        },
        "extract_images": {"resolution": [540, 960]},
    }


def llff_fern() -> dict:
    return {
        "dataloading": {
            "path": "data/nerf_llff_data",
            "scene": ["fern"],
            "random_ref": 1,
            "resize_factor": 4,
        },
        "depth": {"type": None},
        "pose": {"learn_pose": True},
        "rendering": {  # forward-facing scene: NDC parameterization
            "depth_range": [0.0, 1.0],
            "dist_alpha": True,
            "sample_option": "ndc",
        },
        "training": {
            "out_dir": "out/llff/fern",
            "vis_resolution": [75, 100],
        },
        "extract_images": {"resolution": [756, 1008]},
    }


def test_images() -> dict:
    return {
        "dataloading": {
            "path": "data/Test",
            "scene": ["images"],
            "load_colmap_poses": False,
            "customized_focal": True,
        },
        "depth": {"type": None},
        "pose": {"learn_pose": True},
        "training": {
            "out_dir": "out/Test/images",
            "auto_scheduler": True,
            "eval_pose_every": -1,  # demo scene has no GT trajectory
        },
        "extract_images": {"resolution": [540, 960]},
    }


def test_nerf() -> dict:
    return {
        "dataloading": {"path": "data/Tanks", "scene": ["Ignatius"]},
        "depth": {"type": None},
        "pose": {  # vanilla-NeRF simulation: GT poses, nothing learned
            "learn_R": False,
            "learn_t": False,
            "init_pose": True,
            "init_pose_type": "gt",
        },
        "training": {
            "out_dir": "out/Tanks/Ignatius_nerf",
            "auto_scheduler": False,
            "scheduling_start": 0,
            "annealing_epochs": 0,
        },
        "extract_images": {"resolution": [540, 960]},
    }


def emit(path: str, cfg: dict, header: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(f"# {header}\n# (generated by scripts/gen_scene_configs.py; "
                "keys merge over nope_nerf_tpu.config.DEFAULTS)\n")
        yaml.safe_dump(cfg, f, sort_keys=False, default_flow_style=None)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config-dir", default="configs")
    args = ap.parse_args()
    root = args.config_dir

    n = 0
    for scene in VKITTI_SCENES:
        for d in range(1, 15):
            emit(os.path.join(root, "V_KITTI", f"{scene}_d{d}.yaml"),
                 vkitti_variant(scene, d),
                 f"V-KITTI {scene}, depth-supervision experiment d{d} "
                 f"(reference configs/V_KITTI/{scene}_d{d}.yaml)")
            n += 1
        for colmap in (False, True):
            suffix = "_colmap" if colmap else ""
            emit(os.path.join(root, "V_KITTI", f"preprocess_{scene}{suffix}.yaml"),
                 vkitti_preprocess(scene, colmap),
                 f"DPT depth-prior preprocessing for V-KITTI {scene}{suffix} "
                 f"(reference configs/V_KITTI/preprocess_{scene}{suffix}.yaml)")
            n += 1
    for scene in TANKS_SCENES:
        emit(os.path.join(root, "Tanks", f"{scene}.yaml"), tanks(scene),
             f"Tanks-and-Temples {scene}, no depth prior, learned poses "
             f"(reference configs/Tanks/{scene}.yaml)")
        n += 1
    emit(os.path.join(root, "LLFF", "fern.yaml"), llff_fern(),
         "LLFF fern, forward-facing NDC rendering (reference configs/LLFF/fern.yaml)")
    emit(os.path.join(root, "Test", "images.yaml"), test_images(),
         "Demo scene from a bare image folder (reference configs/Test/images.yaml)")
    emit(os.path.join(root, "Test", "nerf.yaml"), test_nerf(),
         "Vanilla-NeRF simulation: frozen GT poses (reference configs/Test/nerf.yaml)")
    n += 3
    print(f"wrote {n} scene configs under {root}/")


if __name__ == "__main__":
    main()
