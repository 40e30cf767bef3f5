"""Integration tests: the fully-jitted train step on a synthetic scene —
loss decreases, all four parameter groups move, schedules behave."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

from nope_nerf_tpu.config import load_config
from nope_nerf_tpu.data import make_synthetic_scene, SceneData, batch_for_frame, frame_iterator
from nope_nerf_tpu.training import TrainState, create_train_state, ModelConfigs, Trainer
from nope_nerf_tpu.training.scheduler import (
    anneal_weight, annealed_weights, rgb_loss_type_at, lr_at_epoch, multistep_lr,
    AutoScheduler,
)


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(overrides={
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 16},
        "training": {"n_training_points": 128, "pc_ratio": 4},
        "pose": {"learn_pose": True, "init_pose": True},
    })
    scene = SceneData.from_dict(dict(make_synthetic_scene(n_frames=4, h=24, w=32)))
    mc = ModelConfigs.from_cfg(cfg, num_cams=scene.n_frames)
    mc = type(mc)(**{**mc.__dict__, "chamfer_tile": 64})
    state, optimizers = create_train_state(jax.random.key(0), mc,
                                           init_c2w=jnp.asarray(scene.c2ws_gt))
    trainer = Trainer(cfg, mc, optimizers)
    return cfg, scene, mc, state, trainer


def test_train_step_runs_and_returns_losses(setup):
    cfg, scene, mc, state, trainer = setup
    batch = batch_for_frame(scene, 0, rng=np.random.RandomState(0))
    state2, ld = trainer.step(state, batch, epoch=0, scheduling_start=10000)
    for k in ["loss", "loss_rgb", "loss_depth", "loss_pc", "loss_rgb_s", "l2_mean"]:
        v = float(ld[k])
        assert np.isfinite(v), f"{k} not finite"
    assert float(ld["loss"]) > 0
    assert int(state2.it) == int(state.it) + 1


def test_loss_decreases_over_steps(setup):
    cfg, scene, mc, state, trainer = setup
    rng = np.random.RandomState(1)
    first_losses, last_losses = [], []
    for ep in range(30):
        for batch in frame_iterator(scene, seed=ep):
            state, ld = trainer.step(state, batch, epoch=ep, scheduling_start=10000)
            if ep < 3:
                first_losses.append(float(ld["loss"]))
            if ep >= 27:
                last_losses.append(float(ld["loss"]))
    assert np.mean(last_losses) < 0.7 * np.mean(first_losses), (
        np.mean(first_losses), np.mean(last_losses))


def test_all_param_groups_update(setup):
    cfg, scene, mc, state, trainer = setup
    batch = batch_for_frame(scene, 1, rng=np.random.RandomState(2))
    state2, _ = trainer.step(state, batch, epoch=0, scheduling_start=10000)
    # frame 1's pose / distortion rows must have moved; nerf weights must move
    assert not np.allclose(np.asarray(state2.params["nerf"]["trunk0_0_w"]),
                           np.asarray(state.params["nerf"]["trunk0_0_w"]))
    assert not np.allclose(np.asarray(state2.params["pose"]["r"][1]),
                           np.asarray(state.params["pose"]["r"][1]))
    assert not np.allclose(np.asarray(state2.params["distortion"]["shift"][1]),
                           np.asarray(state.params["distortion"]["shift"][1]))


def test_render_frame(setup):
    cfg, scene, mc, state, trainer = setup
    batch = batch_for_frame(scene, 0, rng=np.random.RandomState(3))
    out = trainer.render_frame(state, batch, (24, 32), chunk=256)
    assert out["rgb"].shape == (24, 32, 3)
    assert out["depth"].shape == (24, 32)
    assert np.all(np.isfinite(out["rgb"]))


def test_anneal_weight():
    assert anneal_weight(1.0, 0.0, 100, 10, 50) == 1.0
    assert anneal_weight(1.0, 0.0, 100, 10, 200) == 0.0
    assert np.isclose(anneal_weight(1.0, 0.0, 100, 10, 105), 0.5)


def test_rgb_loss_type_switch():
    t = {"annealing_epochs": 2000}
    assert rgb_loss_type_at(t, 100, 50) == "l1"
    assert rgb_loss_type_at(t, 100, 2099) == "l1"
    assert rgb_loss_type_at(t, 100, 2100) == "l2"


def test_lr_schedules():
    # auto-scheduler decay: gamma^((ep-start)//10)
    assert lr_at_epoch(1e-3, 0.9954, 100, 50, 10) == 1e-3
    np.testing.assert_allclose(lr_at_epoch(1e-3, 0.9954, 100, 120, 10),
                               1e-3 * 0.9954 ** 2)
    # multistep
    np.testing.assert_allclose(multistep_lr(1e-3, 0.5, [10, 20, 30], 25),
                               1e-3 * 0.25)


def test_auto_scheduler_plateau():
    s = AutoScheduler(length_smooth=3, patient=2)
    start = 10000
    # improving: stays armed at 10000
    for ep, psnr in enumerate([10, 11, 12, 13, 14]):
        start = s.update(psnr, ep, start)
    assert start == 10000
    # plateau then decline: arms after `patient` failures
    for ep, psnr in enumerate([13, 10, 8, 6, 4], start=5):
        start = s.update(psnr, ep, start)
        if start != 10000:
            break
    assert start != 10000


def test_sparse_depth_resample_path(setup):
    """with_depth mode: nearly-empty masks must still produce a valid step."""
    cfg, scene, mc, state, trainer = setup
    mc_sparse = type(mc)(**{**mc.__dict__, "use_sparse_depth_resample": True})
    sparse = SceneData.from_dict(dict(make_synthetic_scene(n_frames=4, h=24, w=32)))
    mask = np.zeros_like(sparse.depth_masks)
    mask[:, ::6, ::6] = True  # sparse lidar-like pattern
    sparse.depths = sparse.depths * mask
    sparse.depth_masks = mask
    trainer_sparse = Trainer(cfg, mc_sparse, dict(trainer.optimizers))
    batch = batch_for_frame(sparse, 0, rng=np.random.RandomState(4))
    state2, ld = trainer_sparse.step(state, batch, epoch=0, scheduling_start=10000)
    assert np.isfinite(float(ld["loss"]))
    assert np.isfinite(float(ld["loss_depth"]))


def test_scan_steps_matches_per_step(setup):
    """trainer.run_steps (whole-epoch lax.scan, the production train path) must be
    numerically identical to dispatching trainer.step per frame: same host RNG
    draws (data.epoch_order mirrors frame_iterator) and the same device RNG chain
    through state.rng."""
    from nope_nerf_tpu.data import epoch_order

    cfg, scene, mc, state0, trainer = setup
    order, refs = epoch_order(scene.n_frames, shuffle=True, random_ref=1, seed=7)

    s_loop = state0
    for idx, ref in zip(order, refs):
        batch = batch_for_frame(scene, int(idx), ref_idx=int(ref))
        s_loop, ld_loop = trainer.step(s_loop, batch, 0, 10000)

    s_scan, lds = trainer.run_steps(state0, scene, order, refs, 0, 10000)

    assert lds["loss"].shape == (scene.n_frames,)
    np.testing.assert_allclose(float(ld_loop["loss"]), float(lds["loss"][-1]),
                               rtol=1e-6)
    for g in s_loop.params:
        for a, b in zip(jax.tree_util.tree_leaves(s_loop.params[g]),
                        jax.tree_util.tree_leaves(s_scan.params[g])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
    assert int(s_scan.it) == int(s_loop.it)


def test_epoch_order_matches_frame_iterator(setup):
    """epoch_order must consume the host RNG exactly like frame_iterator."""
    from nope_nerf_tpu.data import epoch_order

    cfg, scene, mc, state, trainer = setup
    order, refs = epoch_order(scene.n_frames, shuffle=True, random_ref=1, seed=3)
    batches = list(frame_iterator(scene, shuffle=True, random_ref=1, seed=3))
    assert [int(b["idx"]) for b in batches] == list(map(int, order))
    assert [int(b["ref_idx"]) for b in batches] == list(map(int, refs))


def test_pose_recovery_photometric():
    """The framework's core capability (the NoPe part): camera poses are
    recoverable by gradient descent through the renderer-free photometric-warp
    loss (reprojection via learned relative poses + exact depth priors,
    training.py:367-382 machinery). Perturb GT poses, optimize with rgb_s only,
    and the first-pose-aligned ATE must halve.

    (Chamfer is excluded on purpose: at this 24x32/pc_ratio=1 scale the lifted
    clouds are ~1-unit-spaced grids whose Chamfer floor (~0.5) dwarfs the 0.08
    perturbation — grid-snapping minima would dominate. The warp loss is
    bilinear-subpixel and identifies the pose cleanly.)"""
    from nope_nerf_tpu.data import epoch_order
    from nope_nerf_tpu.evaluation.pose_eval import full_pose_evaluation
    from nope_nerf_tpu.geometry.lie import make_c2w
    from nope_nerf_tpu.models.poses import pose_c2w_all

    cfg = load_config(overrides={
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 24, "depth_range": [0.5, 12.0]},
        "training": {"n_training_points": 192, "pc_ratio": 1,
                     "rgb_weight": [0.0, 0.0], "depth_weight": [0.0, 0.0],
                     "pc_weight": [0.0, 0.0],
                     "pose_lr": 5e-3, "distortion_lr": 0.0},
        "pose": {"learn_pose": True, "init_pose": True},
    })
    scene = SceneData.from_dict(dict(
        make_synthetic_scene(n_frames=4, h=24, w=32, motion=0.25)))
    mc = ModelConfigs.from_cfg(cfg, num_cams=scene.n_frames)
    mc = type(mc)(**{**mc.__dict__, "chamfer_tile": 64})

    rng = np.random.RandomState(7)
    pert = []
    for i in range(scene.n_frames):
        r = jnp.asarray(rng.uniform(-0.06, 0.06, 3), jnp.float32)
        t = jnp.asarray(rng.uniform(-0.08, 0.08, 3), jnp.float32)
        pert.append(np.asarray(make_c2w(r, t)) @ np.asarray(scene.c2ws_gt[i]))
    state, optimizers = create_train_state(
        jax.random.key(0), mc, init_c2w=jnp.asarray(np.stack(pert)))
    trainer = Trainer(cfg, mc, optimizers)

    def ate_of(state):
        est = np.asarray(pose_c2w_all(state.params["pose"], mc.pose))
        return full_pose_evaluation(est, np.asarray(scene.c2ws_gt))["ate_trans"]

    ate0 = ate_of(state)
    order, refs = epoch_order(scene.n_frames, shuffle=True, seed=0)
    for ep in range(100):
        state, lds = trainer.run_steps(state, scene, order, refs, epoch=ep,
                                       scheduling_start=10000)
    ateN = ate_of(state)
    assert np.isfinite(ateN)
    assert ateN < 0.5 * ate0, (ate0, ateN)
    assert float(lds["loss_rgb_s"][-1]) < 0.008


def test_render_frame_async_matches_sync():
    """render_frame(sync=False) + finalize_frame is bitwise the sync result."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nope_nerf_tpu.config import load_config
    from nope_nerf_tpu.data import SceneData, batch_for_frame, make_synthetic_scene
    from nope_nerf_tpu.training import ModelConfigs, Trainer, create_train_state

    cfg = load_config(overrides={
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 8},
        "training": {"n_training_points": 32},
        "tpu": {"use_pallas_renderer": False},
    })
    scene = SceneData.from_dict(dict(make_synthetic_scene(n_frames=2, h=12, w=16)))
    mc = ModelConfigs.from_cfg(cfg, num_cams=2)
    state, optimizers = create_train_state(jax.random.key(0), mc,
                                           init_c2w=jnp.asarray(scene.c2ws_gt))
    tr = Trainer(cfg, mc, optimizers)
    b = {k: jnp.asarray(v) for k, v in batch_for_frame(scene, 0).items()}
    a = tr.render_frame(state, b, (12, 16))
    pending = tr.render_frame(state, b, (12, 16), sync=False)
    bb = tr.finalize_frame(pending)
    np.testing.assert_array_equal(a["rgb"], bb["rgb"])
    np.testing.assert_array_equal(a["depth"], bb["depth"])
