"""Tests for the Phong geometry renderer and the V-KITTI ingestion CLI."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

from nope_nerf_tpu.models.nerf import NerfConfig, init_nerf_params, nerf_density
from nope_nerf_tpu.ops.phong import get_sphere_intersection, ray_marching, phong_render
from nope_nerf_tpu.geometry import pixel_grid
from nope_nerf_tpu.geometry.camera import intrinsics_ndc


def test_sphere_intersection_golden():
    cam = jnp.asarray([0.0, 0.0, 2.0])
    dirs = jnp.asarray([[0.0, 0.0, -1.0],   # through center: hits at 1 and 3
                        [1.0, 0.0, 0.0],    # perpendicular: misses r=1
                        [0.0, 0.0, 1.0]])   # away: both hits behind -> clamped
    hits, mask = get_sphere_intersection(cam, dirs, r=1.0)
    hits = np.asarray(hits)
    assert bool(mask[0]) and not bool(mask[1])
    np.testing.assert_allclose(hits[0], [1.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(hits[2], [0.0, 0.0], atol=1e-5)  # clamp_min(0)


def _dense_cfg():
    """A tiny MLP whose density is high everywhere inside a ball — gives the
    marcher a surface to find by biasing the density head."""
    cfg = NerfConfig(hidden_dim=32)
    params = init_nerf_params(jax.random.key(0), cfg)
    params["density_b"] = jnp.asarray([5.0])  # strongly occupied everywhere
    return cfg, params


def test_ray_marching_finds_surface():
    cfg, params = _dense_cfg()
    origin = jnp.asarray([0.0, 0.0, 3.0])
    dirs = jnp.asarray([[0.0, 0.0, -1.0], [0.1, 0.0, -1.0]])
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    d, mask = ray_marching(params, origin, dirs, cfg, radius=4.0, n_steps=64)
    # occupied everywhere => first sample occupied => d = 0 (inside-surface code)
    assert np.all(np.asarray(d) == 0.0)

    # now free space: suppress density
    params2 = dict(params)
    params2["density_b"] = jnp.asarray([-20.0])
    d2, mask2 = ray_marching(params2, origin, dirs, cfg, radius=4.0, n_steps=64)
    assert np.all(np.isinf(np.asarray(d2)))  # no surface found
    assert not np.any(np.asarray(mask2))


def test_phong_render_shapes():
    cfg = NerfConfig(hidden_dim=32)
    params = init_nerf_params(jax.random.key(1), cfg)
    K = intrinsics_ndc(30.0, 30.0, 32, 24)
    _, pixels = pixel_grid((8, 8))
    out = phong_render(params, pixels, K, jnp.eye(4), None, cfg, n_steps=32)
    assert out["rgb"].shape == (64, 3)
    assert out["rgb_surf"].shape == (64, 3)
    assert np.all(np.isfinite(np.asarray(out["rgb"])))
    v = np.asarray(out["rgb"])
    assert np.all(v >= 0) and np.all(v <= 1)


def _write_fake_vkitti(root, n=6, h=20, w=30):
    import cv2
    from scipy.spatial.transform import Rotation as R
    rgb_dir = os.path.join(root, "vkitti_1.3.1_rgb", "0001", "clone")
    depth_dir = os.path.join(root, "vkitti_1.3.1_depthgt", "0001", "clone")
    ext_dir = os.path.join(root, "vkitti_1.3.1_extrinsicsgt")
    os.makedirs(rgb_dir), os.makedirs(depth_dir), os.makedirs(ext_dir)
    rng = np.random.RandomState(0)
    lines = ["frame " + " ".join(f"r{i}" for i in range(16))]
    for i in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(rgb_dir, f"{i:05d}.png"), img)
        depth_cm = (rng.rand(h, w) * 5000 + 500).astype(np.uint16)
        cv2.imwrite(os.path.join(depth_dir, f"{i:05d}.png"), depth_cm)
        w2c = np.eye(4)
        w2c[:3, :3] = R.from_rotvec([0, 0.05 * i, 0]).as_matrix()
        w2c[:3, 3] = [0.1 * i, 0, 0.5 * i]
        lines.append(f"{i} " + " ".join(str(v) for v in w2c.flatten()))
    with open(os.path.join(ext_dir, "0001_clone.txt"), "w") as f:
        f.write("\n".join(lines))
    return root


def test_vkitti_ingestion(tmp_path, monkeypatch):
    from nope_nerf_tpu.cli.get_vkitti import (
        build_scene, get_filtered_ids, read_extrinsics, convert_pose,
    )
    root = _write_fake_vkitti(str(tmp_path / "raw"))
    extr = read_extrinsics(os.path.join(root, "vkitti_1.3.1_extrinsicsgt",
                                        "0001_clone.txt"))
    assert extr.shape == (6, 4, 4)

    ids = get_filtered_ids(extr, "interval", 0, 6, 2, None, None)
    assert ids == [0, 2, 4]
    ids_t = get_filtered_ids(extr, "threshold", 0, 6, 1, None, 0.4)
    assert ids_t[0] == 0 and len(ids_t) >= 2

    dest = str(tmp_path / "scene")
    resolution = build_scene(root, "1.3.1", "0001", "clone", dest, ids)
    assert resolution == [20, 30]
    assert os.path.exists(os.path.join(dest, "poses_gt.npy"))
    assert os.path.exists(os.path.join(dest, "intrinsics.npz"))
    assert len(os.listdir(os.path.join(dest, "images"))) == 3
    assert len(os.listdir(os.path.join(dest, "disp"))) == 3

    rows = np.load(os.path.join(dest, "poses_gt.npy"))
    assert rows.shape == (3, 17)
    # hwf embedded correctly
    np.testing.assert_allclose(rows[0][:15].reshape(3, 5)[:, 4], [30, 20, 725])
    # bounds positive, in metres
    assert rows[:, 15].min() > 0 and rows[:, 16].max() < 700

    # pose conversion keeps rotations orthonormal
    gl, llff = convert_pose(extr[0])
    np.testing.assert_allclose(gl[:3, :3] @ gl[:3, :3].T, np.eye(3), atol=1e-8)
    np.testing.assert_allclose(llff[:3, :3] @ llff[:3, :3].T, np.eye(3), atol=1e-8)


def test_vkitti_scene_loads_through_datafield(tmp_path):
    """The emitted scene must round-trip through DataField (LLFF consumer)."""
    from nope_nerf_tpu.cli.get_vkitti import build_scene, read_extrinsics
    from nope_nerf_tpu.data import DataField
    root = _write_fake_vkitti(str(tmp_path / "raw"))
    extr = read_extrinsics(os.path.join(root, "vkitti_1.3.1_extrinsicsgt",
                                        "0001_clone.txt"))
    scene_root = str(tmp_path / "data" / "myscene")
    build_scene(root, "1.3.1", "0001", "clone", scene_root, list(range(6)))
    field = DataField(model_path=str(tmp_path / "data"), scene_name=["myscene"],
                      mode="train", resize_factor=None, spherify=False,
                      load_colmap_poses=False, with_depth=True, depth_scale=0.01,
                      sample_rate=8, customized_focal=True)
    s = field.scene
    assert s.imgs.shape[0] == 5  # 6 frames minus 1 test
    assert s.K[0, 0] == pytest.approx(2 * 725 / 30)
    assert np.isfinite(s.depths).all()


def test_frustum_lines():
    from nope_nerf_tpu.cli.vis_poses import frustum_lines
    c2ws = np.tile(np.eye(4), (3, 1, 1))
    segs = frustum_lines(c2ws, 24, 32, 20.0, 20.0)
    assert segs.shape == (3, 8, 2, 3)
    assert np.isfinite(segs).all()


def test_vkitti_emitted_config_trains_and_evals(tmp_path):
    """Full disk pipeline: raw V-KITTI -> build_scene -> make_configs' emitted
    train yaml -> cli.train (real DataField loading) -> checkpoint -> pose eval.
    This is the user journey the reference README documents (get_kittivirtual
    then train.py <config>), end to end on generated data."""
    import argparse

    from nope_nerf_tpu.cli.eval_poses import evaluate_poses
    from nope_nerf_tpu.cli.get_vkitti import build_scene, make_configs, read_extrinsics
    from nope_nerf_tpu.cli.train import train
    from nope_nerf_tpu.config import load_config

    root = _write_fake_vkitti(str(tmp_path / "raw"))
    extr = read_extrinsics(os.path.join(root, "vkitti_1.3.1_extrinsicsgt",
                                        "0001_clone.txt"))
    dest = str(tmp_path / "data" / "scene01")
    resolution = build_scene(root, "1.3.1", "0001", "clone", dest, list(range(6)))

    args = argparse.Namespace(
        resize_factor=1, customised_poses=False, customised_focal=True,
        load_colmap_poses=False, with_depth=True, depth_scale=0.01,
        sparsify_depth=False, sparsify_depth_pattern=[1, 0, 1, 0],
        noise_mean=0.0, noise_std=0.0, offset_x=0, offset_y=0,
        learn_pose=True, init_pose=False, learn_focal=False, update_focal=True,
        learn_distortion=True, simulate_vanilla=False,
        depth_loss_type="l1", traj_option="bspline", bspline_degree=100)
    yaml_path = make_configs(dest, args, resolution,
                             config_dir=str(tmp_path / "configs"))

    cfg = load_config(yaml_path, overrides={
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 8},
        "training": {"n_training_points": 64, "pc_ratio": 2,
                     "out_dir": str(tmp_path / "out"),
                     "print_every": 0, "checkpoint_every": 1,
                     "backup_every": 0, "visualize_every": 0,
                     "eval_pose_every": 0, "eval_img_every": 0},
        "dataloading": {"sample_rate": 6},
    })
    state, trainer, scene = train(cfg, max_epochs=2)
    assert scene.n_frames == 5  # 6 frames minus every-6th test view
    assert os.path.exists(os.path.join(str(tmp_path / "out"), "model.ckpt"))
    assert np.isfinite(float(jax.tree.leaves(state.params)[0].sum()))

    metrics = evaluate_poses(cfg)
    assert np.isfinite(metrics["ate_trans"])


def test_vkitti_degraded_depth_pipeline_trains_finite(tmp_path):
    """The thesis's experiment matrix degrades the GT depth priors (sparsify /
    noise / camera-LiDAR offset — reference configs d1-d14). The emitted config
    with all three enabled must load, train with the sparse-validity resample
    path active, and stay finite."""
    import argparse

    from nope_nerf_tpu.cli.get_vkitti import build_scene, make_configs
    from nope_nerf_tpu.cli.train import train
    from nope_nerf_tpu.config import load_config

    root = _write_fake_vkitti(str(tmp_path / "raw"))
    dest = str(tmp_path / "data" / "scene02")
    resolution = build_scene(root, "1.3.1", "0001", "clone", dest, list(range(6)))
    args = argparse.Namespace(
        resize_factor=1, customised_poses=False, customised_focal=True,
        load_colmap_poses=False, with_depth=True, depth_scale=0.01,
        sparsify_depth=True, sparsify_depth_pattern=[2, 0, 2, 0],
        noise_mean=0.0, noise_std=0.05, offset_x=1, offset_y=1,
        learn_pose=True, init_pose=False, learn_focal=False, update_focal=True,
        learn_distortion=True, simulate_vanilla=False,
        depth_loss_type="l1", traj_option="bspline", bspline_degree=100)
    yaml_path = make_configs(dest, args, resolution,
                             config_dir=str(tmp_path / "configs"))
    cfg = load_config(yaml_path, overrides={
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 8},
        "training": {"n_training_points": 64, "pc_ratio": 2,
                     "out_dir": str(tmp_path / "out"),
                     "print_every": 0, "checkpoint_every": 0,
                     "backup_every": 0, "visualize_every": 0,
                     "eval_pose_every": 0, "eval_img_every": 0},
        "dataloading": {"sample_rate": 6},
    })
    state, trainer, scene = train(cfg, max_epochs=3)
    masks = np.asarray(scene.depth_masks)
    assert masks.any() and not masks.all()  # sparsified: mixed validity
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()
