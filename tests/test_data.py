"""Data-layer tests: LLFF preprocessing properties, on-disk scene round-trip via
DataField, and the depth-degradation suite."""

import os

import numpy as np
import pytest

from nope_nerf_tpu.data.llff import (
    make_c2ws_from_llff, recenter_poses, spherify_poses, load_llff_data,
    load_gt_depths, load_depths_npz, poses_avg,
)
from nope_nerf_tpu.data.degrade import offset_depths, sparsify_depths
from nope_nerf_tpu.data import DataField


def _random_llff_poses(n=10, seed=0, h=24, w=32, focal=20.0, metric_scale=5.0):
    """(3, 5, N) LLFF stack + (2, N) bounds, as poses_bounds.npy stores them."""
    from scipy.spatial.transform import Rotation as R
    rng = np.random.RandomState(seed)
    mats = []
    for i in range(n):
        rot = R.from_rotvec(rng.randn(3) * 0.1).as_matrix()
        t = rng.randn(3) * metric_scale + [0, 0, 10]
        hwf = np.array([h, w, focal])[:, None]
        mats.append(np.concatenate([rot, t[:, None], hwf], 1))
    poses = np.stack(mats, -1)  # (3, 5, N)
    bds = np.stack([np.full(n, 4.0) + rng.rand(n), np.full(n, 30.0)], 0)
    return poses.astype(np.float64), bds.astype(np.float64)


def test_recenter_makes_average_identity():
    poses, bds = _random_llff_poses()
    poses_n = np.moveaxis(poses, -1, 0)
    recentered, c2w = recenter_poses(poses_n)
    avg_after = poses_avg(recentered)
    np.testing.assert_allclose(avg_after[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(avg_after[:3, 3], 0, atol=1e-6)


def test_make_c2ws_scaling():
    poses, bds = _random_llff_poses()
    c2ws, H, W, focal, reverse, bds_out = make_c2ws_from_llff(
        poses, bds, spherify=False, bd_factor=0.75)
    assert c2ws.shape == (10, 4, 4)
    assert (H, W) == (24, 32) and np.isclose(focal, 20.0)
    np.testing.assert_allclose(reverse["sc"], 1.0 / (bds.min() * 0.75), rtol=1e-6)
    np.testing.assert_allclose(c2ws[:, 3], np.tile([0, 0, 0, 1], (10, 1)), atol=0)
    # rotations stay orthonormal through the pipeline
    RtR = np.einsum("nij,nik->njk", c2ws[:, :3, :3], c2ws[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)


def test_spherify_unit_radius():
    poses, bds = _random_llff_poses(seed=1)
    poses_n = np.moveaxis(poses, -1, 0).astype(np.float32)
    reset, _, bds_out, sc, c2w44 = spherify_poses(poses_n, np.moveaxis(bds, -1, 0))
    rad = np.sqrt(np.mean(np.sum(reset[:, :3, 3] ** 2, -1)))
    np.testing.assert_allclose(rad, 1.0, rtol=1e-5)


def _write_fake_scene(root, n=10, h=24, w=32):
    import cv2
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    os.makedirs(os.path.join(root, "dpt"), exist_ok=True)
    rng = np.random.RandomState(3)

    poses, bds = _random_llff_poses(n=n, h=h, w=w)
    rows = np.concatenate([poses.transpose(2, 0, 1).reshape(n, 15),
                           np.moveaxis(bds, -1, 0)], 1)
    np.save(os.path.join(root, "poses_bounds.npy"), rows)
    np.save(os.path.join(root, "poses_gt.npy"), rows)  # same trajectory as "GT"

    for i in range(n):
        name = f"{i:04d}"
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "images", name + ".png"), img)
        depth_m = 5.0 + 10.0 * rng.rand(h, w)
        depth_px = (depth_m * 100).astype(np.uint16)  # V-KITTI 100:1 px->m
        cv2.imwrite(os.path.join(root, "depth", name + ".png"), depth_px)
        np.savez(os.path.join(root, "dpt", f"depth_{name}.npz"),
                 pred=depth_m.astype(np.float32))
    return n, h, w


def test_datafield_dpt_mode(tmp_path):
    root = str(tmp_path / "scene")
    n, h, w = _write_fake_scene(root)
    field = DataField(model_path=str(tmp_path), scene_name=["scene"], mode="train",
                      resize_factor=None, spherify=False, sample_rate=8)
    scene = field.scene
    n_test = len(np.arange(n)[4::8])
    assert scene.n_frames == n - n_test
    assert scene.imgs.shape == (scene.n_frames, h, w, 3)
    assert scene.depths.shape == (scene.n_frames, h, w)
    assert scene.K[0, 0] == pytest.approx(2 * 20.0 / w)
    assert scene.K[1, 1] == pytest.approx(-2 * 20.0 / h)
    assert scene.gt_depths is not None
    assert np.all(scene.depth_masks)
    # GT poses went through LLFF preprocessing: unit-ish scale, recentered
    assert np.abs(scene.c2ws_gt[:, :3, 3]).max() < 50


def test_datafield_gt_depth_with_degradations(tmp_path):
    root = str(tmp_path / "scene")
    n, h, w = _write_fake_scene(root)
    field = DataField(model_path=str(tmp_path), scene_name=["scene"], mode="train",
                      resize_factor=None, spherify=False, sample_rate=8,
                      with_depth=True, depth_scale=0.01, noise_std=0.1,
                      offset_x=2, offset_y=1, sparsify_depth=True,
                      sparsify_depth_pattern=[1, 1, 1, 1])
    scene = field.scene
    # sparsification + offset must invalidate some pixels
    assert scene.depth_masks.mean() < 0.5
    assert np.all(scene.depths[~scene.depth_masks] == 0)
    # depths rescaled by reverse['sc']: valid depths in preprocessed units
    valid = scene.depths[scene.depth_masks]
    assert valid.min() > 0 and np.isfinite(valid).all()


def test_datafield_eval_split(tmp_path):
    root = str(tmp_path / "scene")
    n, h, w = _write_fake_scene(root)
    field = DataField(model_path=str(tmp_path), scene_name=["scene"], mode="eval",
                      resize_factor=None, spherify=False, sample_rate=8)
    assert field.scene.n_frames == len(np.arange(n)[4::8])


def test_offset_depths_boundaries():
    d = np.ones((2, 8, 10), np.float32)
    m = np.ones((2, 8, 10), bool)
    d2, m2 = offset_depths(d, m, y_shift=2, x_shift=-3)
    assert not m2[:, :2, :].any()     # top rows invalid
    assert not m2[:, :, -3:].any()    # right cols invalid
    assert m2[:, 2:, :-3].all()


def test_sparsify_pattern():
    d = np.ones((1, 6, 6), np.float32)
    m = np.ones((1, 6, 6), bool)
    d2, m2 = sparsify_depths(d, m, [1, 1, 1, 1])  # checkerboard-ish 2x2 period
    assert m2.mean() == pytest.approx(0.25)
    assert (d2 == m2).all()


def test_load_depths_npz_norm(tmp_path):
    root = str(tmp_path / "scene")
    _write_fake_scene(root, n=4)
    names = [f"{i:04d}.png" for i in range(4)]
    d = load_depths_npz(names, os.path.join(root, "dpt"), norm=True)
    t_all = np.median(d)
    for i in range(4):
        np.testing.assert_allclose(np.median(d[i]), t_all, rtol=0.15)
