"""The synthetic driving scene and its V-KITTI-format on-disk round trip.

Covers the full write -> LLFF-ingest -> metric-revert chain: depths survive the
centimetre PNG quantization, poses survive the LLFF row swizzle + recenter +
rescale + reverse bookkeeping, and the degraded COLMAP-stand-in init differs
from GT by the requested noise magnitude.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

from nope_nerf_tpu.config import load_config
from nope_nerf_tpu.data import DataField, make_driving_scene, write_vkitti_scene
from nope_nerf_tpu.evaluation.pose_eval import revert_to_metric

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def disk_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("demo")
    scene = make_driving_scene(n_frames=10, h=32, w=48)
    write_vkitti_scene(os.path.join(root, "drive"), scene,
                       pose_noise_deg=1.0, pose_noise_trans=0.05)
    return root, scene


def test_driving_scene_structure():
    s = make_driving_scene(n_frames=6, h=24, w=32)
    assert s["imgs"].shape == (6, 24, 32, 3)
    assert s["depths"].shape == (6, 24, 32)
    assert np.isfinite(s["depths"]).all() and (s["depths"] > 0).all()
    # real depth structure: ground up close, background far
    assert s["depths"].min() < 3.0 and s["depths"].max() > 50.0
    # multi-view consistency at the image centre strip: reprojected world hits of
    # frame 0 and frame 1 agree where both see the same billboard/wall
    assert 0.0 <= s["imgs"].min() and s["imgs"].max() <= 1.0


def test_disk_round_trip(disk_scene):
    root, scene = disk_scene
    cfg = load_config(os.path.join(REPO, "configs", "demo_drive.yaml"),
                      overrides={"dataloading": {"path": str(root)}})
    field = DataField.from_cfg(cfg, mode="all")
    sd = field.scene
    n, h, w = scene["depths"].shape

    assert sd.imgs.shape == (n, h, w, 3)
    # images round-trip within PNG 8-bit quantization
    assert np.abs(sd.imgs - scene["imgs"]).max() < 1.5 / 255.0

    # GT depths: png stores cm; the loader multiplies by depth_scale and the full
    # preprocessing rescale (sc, and sc_spherify since spherify defaults on).
    factor = sd.reverse["sc"] * (sd.reverse.get("sc_spherify") or 1.0)
    metric_depth = np.asarray(sd.depths) / factor
    assert np.abs(metric_depth - scene["depths"]).max() < 0.0051  # rounded cm
    # the clean eval copy (gt_depths) is loaded without the rescale: raw metres
    assert np.abs(np.asarray(sd.gt_depths) - scene["depths"]).max() < 0.0051

    # poses: revert_to_metric must undo swizzle+rescale+recenter exactly
    gt_metric = revert_to_metric(np.asarray(sd.c2ws_gt), sd.reverse)
    assert np.allclose(gt_metric, scene["c2ws_gt"], atol=1e-4)


def test_full_cli_chain_on_disk(disk_scene, tmp_path):
    """train -> eval_poses -> eval -> render, all through the ON-DISK data path
    (every other CLI test uses --synthetic). Tiny shapes; unfused CPU render."""
    from nope_nerf_tpu.cli.eval import evaluate
    from nope_nerf_tpu.cli.eval_poses import evaluate_poses
    from nope_nerf_tpu.cli.render import render
    from nope_nerf_tpu.cli.train import train

    root, _ = disk_scene
    overrides = {
        "dataloading": {"path": str(root)},
        "rendering": {"num_points": 16},
        "training": {"out_dir": str(tmp_path / "out"), "n_training_points": 64,
                     "eval_pose_every": -1, "eval_img_every": -1,
                     "vis_geo": False},
        "eval_pose": {"opt_pose_epoch": 4, "n_points": 64},
        "extract_images": {"N_novel_imgs": 3, "resolution": [16, 24],
                           "eval_depth": True},
        "tpu": {"use_pallas_renderer": False},
    }
    cfg = load_config(os.path.join(REPO, "configs", "demo_drive.yaml"),
                      overrides=overrides)
    state, _, _ = train(cfg, max_epochs=2)
    assert os.path.exists(os.path.join(cfg["training"]["out_dir"], "model.ckpt"))
    metrics = evaluate_poses(cfg)
    assert np.isfinite(metrics["ate_trans"])
    summary = evaluate(cfg)
    assert np.isfinite(summary["mean_psnr"]) and np.isfinite(summary["abs_rel"])
    frames = render(cfg)
    assert len(frames) == 3


def test_crop_size_pipeline(disk_scene):
    """crop_size: images border-cropped then resized back (cache dir keyed by
    crop_size so a different setting never reuses stale pixels), focal scaled
    by 1/focal_crop_factor, GT depths cropped to match
    (reference common.py:96-114, :293-297, dataset.py:56-57,79-80)."""
    root, scene = disk_scene
    crop = 4
    n, h, w = scene["depths"].shape
    cfg = load_config(os.path.join(REPO, "configs", "demo_drive.yaml"),
                      overrides={"dataloading": {"path": str(root),
                                                 "crop_size": crop}})
    field = DataField.from_cfg(cfg, mode="all")
    sd = field.scene
    assert os.path.isdir(os.path.join(root, "drive", f"images_cropped_{crop}"))
    assert sd.imgs.shape == (n, h, w, 3)  # resized back to original size

    # focal zoom: fx' = fx / ((h - 2*crop)/h)
    fx_expected = float(scene["fx"]) / ((h - 2 * crop) / h)
    fx_loaded = float(sd.K[0, 0]) * w / 2.0
    assert abs(fx_loaded - fx_expected) < 1e-3

    # depth priors: border content is gone — the loaded (cropped+resized) depth
    # at the image centre still matches the scene's centre depth
    factor = sd.reverse["sc"] * (sd.reverse.get("sc_spherify") or 1.0)
    centre = np.asarray(sd.depths)[0, h // 2, w // 2] / factor
    assert abs(centre - scene["depths"][0, h // 2, w // 2]) < 0.35

    # DPT prior dir would get the _<crop> suffix
    cfg2 = load_config(os.path.join(REPO, "configs", "demo_drive.yaml"),
                       overrides={"dataloading": {"path": str(root),
                                                  "crop_size": crop,
                                                  "with_depth": False}})
    with pytest.raises(FileNotFoundError, match=f"dpt_{crop}"):
        DataField.from_cfg(cfg2, mode="all")


def test_colmap_init_noise(disk_scene):
    root, scene = disk_scene
    cfg = load_config(os.path.join(REPO, "configs", "demo_drive.yaml"),
                      overrides={"dataloading": {"path": str(root)}})
    field = DataField.from_cfg(cfg, mode="all")
    sd = field.scene
    init_metric = revert_to_metric(np.asarray(sd.c2ws_init), field.reverse_init)
    # the init trajectory is close to but NOT equal to GT (noised reconstruction)
    dt = np.linalg.norm(init_metric[:, :3, 3] - scene["c2ws_gt"][:, :3, 3], axis=-1)
    assert 0.005 < dt.mean() < 0.3
    tr = np.einsum("nii->n", np.einsum(
        "nij,nkj->nik", init_metric[:, :3, :3], scene["c2ws_gt"][:, :3, :3]))
    ang = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
    assert 0.05 < ang.mean() < 5.0
