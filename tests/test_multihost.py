"""Multi-host helper tests (pure index math, single-host testable) + the
reprojection-pair visualization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nope_nerf_tpu.parallel.multihost import (
    host_frame_schedule, host_ray_slice, host_image_tiles,
)


def test_frame_schedule_deterministic_across_hosts():
    a = host_frame_schedule(10, epoch=3, seed=42)
    b = host_frame_schedule(10, epoch=3, seed=42)
    np.testing.assert_array_equal(a, b)
    c = host_frame_schedule(10, epoch=4, seed=42)
    assert not np.array_equal(a, c)
    assert sorted(a.tolist()) == list(range(10))


def test_ray_slices_partition():
    slices = [host_ray_slice(1024, pi, 4) for pi in range(4)]
    assert slices[0] == (0, 256) and slices[3] == (768, 1024)
    covered = sorted(x for lo, hi in slices for x in range(lo, hi))
    assert covered == list(range(1024))


def test_image_tiles_partition():
    tiles = [host_image_tiles(100, pi, 3) for pi in range(3)]
    covered = sorted(r for lo, hi in tiles for r in range(lo, hi))
    assert covered == list(range(100))
    # degenerate: more hosts than rows
    tiles = [host_image_tiles(2, pi, 4) for pi in range(4)]
    covered = sorted(r for lo, hi in tiles for r in range(lo, hi))
    assert covered == [0, 1]


def test_reprojection_pair():
    from nope_nerf_tpu.config import load_config
    from nope_nerf_tpu.data import SceneData, batch_for_frame, make_synthetic_scene
    from nope_nerf_tpu.training import ModelConfigs, Trainer, create_train_state

    cfg = load_config(overrides={
        "model": {"hidden_dim": 32}, "rendering": {"num_points": 8},
        "training": {"n_training_points": 64},
        "pose": {"learn_pose": True, "init_pose": True}})
    scene = SceneData.from_dict(dict(make_synthetic_scene(n_frames=3, h=24, w=32)))
    mc = ModelConfigs.from_cfg(cfg, num_cams=3)
    state, optimizers = create_train_state(jax.random.key(0), mc,
                                           init_c2w=jnp.asarray(scene.c2ws_gt))
    trainer = Trainer(cfg, mc, optimizers)
    batch = batch_for_frame(scene, 0, rng=np.random.RandomState(0))
    a, b, valid = trainer.reprojection_pair(state, batch)
    assert a.shape == (6, 8, 3) and b.shape == (6, 8, 3) and valid.shape == (6, 8)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # at GT poses with consistent depths, the warp should roughly match where valid
    m = valid.astype(bool)
    if m.sum() > 4:
        assert np.abs(a[m] - b[m]).mean() < 0.2
