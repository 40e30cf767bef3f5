"""Occupancy-grid guided sampling (ops/occupancy.py — TPU-native extension,
no reference counterpart; default OFF for reference parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

from nope_nerf_tpu.config import load_config
from nope_nerf_tpu.models.nerf import NerfConfig, init_nerf_params
from nope_nerf_tpu.ops.occupancy import (
    grid_lookup,
    make_occupancy_grid,
    occupancy_z_samples,
    update_occupancy_grid,
)


def test_grid_lookup_inside_outside():
    g = make_occupancy_grid(8) * 0.0
    g = g.at[4, 4, 4].set(0.7)
    r = 4.0
    cell_centre = jnp.array([[0.25, 0.25, 0.25]])  # cell (4,4,4) spans [0,1)^3
    far_cell = jnp.array([[-3.9, -3.9, -3.9]])
    outside = jnp.array([[5.0, 0.0, 0.0]])
    occ = grid_lookup(g, jnp.concatenate([cell_centre, far_cell, outside]), r)
    assert occ[0] == pytest.approx(0.7)
    assert occ[1] == 0.0
    # outside the cube reads 0.0: floor-level coverage, like learned-empty —
    # 1.0 would hand max weight to every beyond-radius probe (budget theft)
    assert occ[2] == 0.0


def test_update_grid_tracks_density():
    """The EMA grid lights up where the (random-init) field is dense: verify
    against a direct density query at cell centres."""
    from nope_nerf_tpu.models.nerf import nerf_density

    ncfg = NerfConfig(hidden_dim=32)
    params = init_nerf_params(jax.random.key(0), ncfg)
    grid = make_occupancy_grid(16) * 0.0  # start empty to see the update alone
    grid = update_occupancy_grid(grid, params, jax.random.key(1), ncfg,
                                 radius=4.0, decay=0.95)
    assert grid.shape == (16, 16, 16)
    assert jnp.all(grid >= 0.0) and jnp.all(grid <= 1.0)
    assert float(grid.max()) > 0.0
    # occupancy (dist_alpha=False default): starting from an empty grid the
    # update stores exactly the density at the jittered centres — reproduce the
    # same jitter (same key, same centre layout) and compare
    res, r = 16, 4.0
    cell = 2 * r / res
    centers = (jnp.stack(jnp.meshgrid(*([jnp.arange(res)] * 3), indexing="ij"),
                         -1).reshape(-1, 3) + 0.5) * cell - r
    pts = centers + jax.random.uniform(jax.random.key(1), centers.shape,
                                       minval=-0.5, maxval=0.5) * cell
    d = nerf_density(params, pts, ncfg)[..., 0].reshape(grid.shape)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(d),
                               rtol=1e-6, atol=1e-6)


def test_ema_decay_keeps_past_occupancy():
    ncfg = NerfConfig(hidden_dim=32)
    params = init_nerf_params(jax.random.key(0), ncfg)
    g0 = make_occupancy_grid(8)  # fully occupied
    g1 = update_occupancy_grid(g0, params, jax.random.key(1), ncfg,
                               radius=4.0, decay=0.95)
    assert jnp.all(g1 >= 0.95 * g0 - 1e-6)  # max(decay*old, new) floor


def test_samples_concentrate_in_occupied_band():
    """A grid occupied only in a z-slab pulls most samples into that slab while
    the floor keeps some coverage elsewhere."""
    res, r = 32, 4.0
    g = make_occupancy_grid(res) * 0.0
    # occupy world z in [-2.5, -1.5] (camera at origin looking along -z)
    zlo, zhi = int((-2.5 + r) / (2 * r) * res), int((-1.5 + r) / (2 * r) * res)
    g = g.at[:, :, zlo:zhi].set(1.0)

    n, S = 64, 128
    origin = jnp.zeros((3,))
    ray_vec = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    z = occupancy_z_samples(jax.random.key(0), origin, ray_vec, g, S,
                            (0.01, 4.0), r, floor=0.01, add_noise=True)
    assert z.shape == (n, S)
    assert jnp.all(z[:, 1:] >= z[:, :-1])  # sorted
    in_band = jnp.mean(((z >= 1.5) & (z <= 2.5)).astype(jnp.float32))
    assert float(in_band) > 0.6           # concentrated...
    assert float(jnp.mean((z < 1.4).astype(jnp.float32))) > 0.01  # ...not starved


def test_occupancy_train_step_runs_and_matches_paths():
    """End-to-end: a train step with the grid in the batch runs finite, and the
    sharded loss/grads match single-chip with the same grid (noise off, fp32 —
    same protocol as test_parallel)."""
    import functools

    from nope_nerf_tpu.data import SceneData, batch_for_frame, make_synthetic_scene
    from nope_nerf_tpu.parallel import make_mesh
    from nope_nerf_tpu.training import ModelConfigs, Trainer, create_train_state
    from nope_nerf_tpu.training.trainer import compute_step_loss

    cfg = load_config(overrides={
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 16, "occupancy_grid": True,
                      "occupancy_res": 16},
        "training": {"n_training_points": 64},
        "pose": {"learn_pose": True, "init_pose": True},
        "tpu": {"use_pallas_renderer": False},
    })
    scene = SceneData.from_dict(dict(make_synthetic_scene(n_frames=3, h=24, w=32)))
    mc = ModelConfigs.from_cfg(cfg, num_cams=3)
    mc = type(mc)(**{**mc.__dict__, "chamfer_tile": 64, "stratified_noise": False,
                     "nerf": type(mc.nerf)(**{**mc.nerf.__dict__,
                                              "compute_dtype": "float32"})})
    state, optimizers = create_train_state(jax.random.key(0), mc,
                                           init_c2w=jnp.asarray(scene.c2ws_gt))
    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in batch_for_frame(scene, 0, rng=rng).items()}

    trainer = Trainer(cfg, mc, optimizers)
    trainer.update_occupancy(state, epoch=0)
    assert trainer.occ_grid is not None and trainer.occ_grid.shape == (16,) * 3

    s1, ld1 = trainer.step(state, batch, epoch=0, scheduling_start=10000)
    assert np.isfinite(float(ld1["loss"]))

    # grad-level parity vs the sharded path, grid replicated over the mesh
    batch_g = {**batch, "occ_grid": trainer.occ_grid}
    weights = {k: jnp.asarray(1.0) for k in
               ["rgb_weight", "depth_weight", "pc_weight", "rgb_s_weight",
                "depth_consistency_weight", "weight_dist_2nd_loss",
                "weight_dist_1st_loss", "t_cycle_weight"]}
    ray_idx = jnp.arange(64)
    key = jax.random.key(7)
    vg_single = jax.jit(jax.value_and_grad(
        functools.partial(compute_step_loss, mc=mc, rgb_loss_type="l2", mesh=None),
        has_aux=True))
    vg_mesh = jax.jit(jax.value_and_grad(
        functools.partial(compute_step_loss, mc=mc, rgb_loss_type="l2",
                          mesh=make_mesh(4)), has_aux=True))
    (loss_s, _), grads_s = vg_single(state.params, batch_g, weights=weights,
                                     ray_idx=ray_idx, key=key)
    (loss_m, _), grads_m = vg_mesh(state.params, batch_g, weights=weights,
                                   ray_idx=ray_idx, key=key)
    np.testing.assert_allclose(float(loss_s), float(loss_m), rtol=2e-5)
    for la, lb in zip(jax.tree.leaves(grads_s), jax.tree.leaves(grads_m)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=5e-4, atol=1e-6)


def test_occupancy_off_is_bitexact_reference_path():
    """With occupancy_grid false (default) nothing changes: same state as a
    trainer that has never heard of grids."""
    from nope_nerf_tpu.data import SceneData, batch_for_frame, make_synthetic_scene
    from nope_nerf_tpu.training import ModelConfigs, Trainer, create_train_state

    cfg = load_config(overrides={
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 16},
        "training": {"n_training_points": 64},
        "pose": {"learn_pose": True, "init_pose": True},
        "tpu": {"use_pallas_renderer": False},
    })
    scene = SceneData.from_dict(dict(make_synthetic_scene(n_frames=3, h=24, w=32)))
    mc = ModelConfigs.from_cfg(cfg, num_cams=3)
    state, optimizers = create_train_state(jax.random.key(0), mc,
                                           init_c2w=jnp.asarray(scene.c2ws_gt))
    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in batch_for_frame(scene, 0, rng=rng).items()}
    trainer = Trainer(cfg, mc, optimizers)
    trainer.update_occupancy(state, epoch=0)
    assert trainer.occ_grid is None  # disabled -> no grid, no batch change
    s1, ld1 = trainer.step(state, batch, epoch=0, scheduling_start=10000)
    s2, ld2 = Trainer(cfg, mc, optimizers).step(state, batch, epoch=0,
                                                scheduling_start=10000)
    np.testing.assert_array_equal(np.asarray(ld1["loss"]), np.asarray(ld2["loss"]))


def test_boundary_bins_reachable():
    """Occupancy hugging the near bound still attracts samples (the probe
    ladder is extended so sample_pdf's edge-weight trim can't hide it)."""
    res, r = 32, 4.0
    g = make_occupancy_grid(res) * 0.0
    # occupy only world z in [-0.25, 0] -> ray depth [0, 0.25], at the near edge
    g = g.at[:, :, res // 2 - 1].set(1.0)
    n, S = 32, 64
    origin = jnp.zeros((3,))
    ray_vec = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    z = occupancy_z_samples(jax.random.key(0), origin, ray_vec, g, S,
                            (0.01, 4.0), r, floor=0.01, add_noise=True)
    assert jnp.all(z >= 0.01) and jnp.all(z <= 4.0)
    near_frac = float(jnp.mean((z <= 0.3).astype(jnp.float32)))
    assert near_frac > 0.3


def test_update_every_zero_and_negative_no_crash():
    from nope_nerf_tpu.data import SceneData, make_synthetic_scene
    from nope_nerf_tpu.training import ModelConfigs, Trainer, create_train_state

    cfg = load_config(overrides={
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 16, "occupancy_grid": True,
                      "occupancy_res": 8, "occupancy_update_every": 0},
        "training": {"n_training_points": 64},
        "tpu": {"use_pallas_renderer": False},
    })
    mc = ModelConfigs.from_cfg(cfg, num_cams=2)
    state, optimizers = create_train_state(jax.random.key(0), mc)
    tr = Trainer(cfg, mc, optimizers)
    tr.update_occupancy(state, epoch=0)   # must not divide by zero
    # grid exists from the first call (stable batch pytree), but stays all-ones
    assert tr.occ_grid is not None
    np.testing.assert_array_equal(np.asarray(tr.occ_grid), 1.0)


def test_grid_checkpoint_roundtrip(tmp_path):
    """The EMA grid rides in the checkpoint scalars: a resumed run continues
    with the learned grid instead of resetting to all-ones."""
    from nope_nerf_tpu.cli.train import train

    over = {
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 16, "occupancy_grid": True,
                      "occupancy_res": 8},
        "training": {"n_training_points": 64, "out_dir": str(tmp_path / "out"),
                     "print_every": 0, "checkpoint_every": 0, "backup_every": 0,
                     "visualize_every": 0, "eval_pose_every": -1,
                     "eval_img_every": -1},
        "pose": {"learn_pose": True, "init_pose": True},
        "tpu": {"use_pallas_renderer": False},
    }
    cfg = load_config(overrides=over)
    _, tr1, _ = train(cfg, synthetic=True, max_epochs=3)
    g1 = np.asarray(tr1.occ_grid)
    assert not np.allclose(g1, 1.0)  # the EMA has moved off all-ones

    cfg2 = load_config(overrides=over)
    _, tr2, _ = train(cfg2, synthetic=True, max_epochs=4)  # resumes +1 epoch
    g2 = np.asarray(tr2.occ_grid)
    # one more EMA update on top of the restored grid, not a fresh all-ones:
    # everywhere the new density is below the decayed old value, g2 == 0.95*g1
    decayed = np.isclose(g2, 0.95 * g1, rtol=1e-5)
    assert decayed.mean() > 0.2
    assert np.all(g2 <= np.maximum(0.95 * g1, 1.0) + 1e-6)


def test_resume_with_occupancy_disabled_stays_disabled(tmp_path):
    """A checkpoint from an occupancy run must not re-enable the feature under
    a config that turned it off (set_occupancy_grid gates on enabled)."""
    from nope_nerf_tpu.cli.train import train

    over = {
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 16, "occupancy_grid": True,
                      "occupancy_res": 8},
        "training": {"n_training_points": 64, "out_dir": str(tmp_path / "out"),
                     "print_every": 0, "checkpoint_every": 0, "backup_every": 0,
                     "visualize_every": 0, "eval_pose_every": -1,
                     "eval_img_every": -1},
        "pose": {"learn_pose": True, "init_pose": True},
        "tpu": {"use_pallas_renderer": False},
    }
    train(load_config(overrides=over), synthetic=True, max_epochs=2)

    over_off = {**over, "rendering": {**over["rendering"],
                                      "occupancy_grid": False}}
    _, tr, _ = train(load_config(overrides=over_off), synthetic=True,
                     max_epochs=3)  # resumes from the occupancy checkpoint
    assert tr.occ_grid is None


def test_ndc_disables_occupancy(capsys):
    """With sample_option=ndc the NDC branch owns z-sampling (ops/render.py),
    so occupancy must be disabled up front — not EMA-updated into dead weight
    every epoch."""
    from nope_nerf_tpu.training import ModelConfigs, Trainer, create_train_state

    cfg = load_config(overrides={
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 8, "occupancy_grid": True,
                      "sample_option": "ndc"},
    })
    mc = ModelConfigs.from_cfg(cfg, num_cams=2)
    state, optimizers = create_train_state(jax.random.key(0), mc)
    trainer = Trainer(cfg, mc, optimizers)
    assert "ignored with sample_option=ndc" in capsys.readouterr().out
    trainer.update_occupancy(state, epoch=0)
    assert trainer.occ_grid is None  # never created
    trainer.set_occupancy_grid(make_occupancy_grid(16))
    assert trainer.occ_grid is None  # checkpoint grid ignored too


def test_set_occupancy_grid_resolution_mismatch_warns(capsys):
    """A checkpointed grid of a different resolution rules the rest of the run
    (update_occupancy never recreates a non-None grid) — must say so."""
    from nope_nerf_tpu.training import ModelConfigs, Trainer, create_train_state

    cfg = load_config(overrides={
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 8, "occupancy_grid": True,
                      "occupancy_res": 32},
    })
    mc = ModelConfigs.from_cfg(cfg, num_cams=2)
    _, optimizers = create_train_state(jax.random.key(0), mc)
    trainer = Trainer(cfg, mc, optimizers)
    trainer.set_occupancy_grid(make_occupancy_grid(16))
    assert trainer.occ_grid.shape == (16, 16, 16)  # kept, but loudly
    assert "keeping the checkpoint's resolution" in capsys.readouterr().out
