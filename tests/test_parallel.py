"""Multi-chip sharding tests on the 8-virtual-device CPU mesh: the sharded train
step must (a) run and converge, and (b) produce losses/grads identical to the
single-chip path when stochastic sampling is disabled."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier

from nope_nerf_tpu.config import load_config
from nope_nerf_tpu.data import make_synthetic_scene, SceneData, batch_for_frame
from nope_nerf_tpu.parallel import make_mesh
from nope_nerf_tpu.training import create_train_state, ModelConfigs, Trainer
from nope_nerf_tpu.training.trainer import compute_step_loss


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(overrides={
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 16},
        "training": {"n_training_points": 128},
        "pose": {"learn_pose": True, "init_pose": True},
    })
    scene = SceneData.from_dict(dict(make_synthetic_scene(n_frames=4, h=24, w=32)))
    mc = ModelConfigs.from_cfg(cfg, num_cams=scene.n_frames)
    mc = type(mc)(**{**mc.__dict__, "chamfer_tile": 64, "stratified_noise": False,
                     # exact psum-vs-global comparison needs deterministic fp32 matmuls
                     "nerf": type(mc.nerf)(**{**mc.nerf.__dict__,
                                              "compute_dtype": "float32"})})
    state, optimizers = create_train_state(jax.random.key(0), mc,
                                           init_c2w=jnp.asarray(scene.c2ws_gt))
    return cfg, scene, mc, state, optimizers


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_matches_single_chip(setup):
    """With stratified noise off, the sharded loss and grads must match the
    single-chip values to float tolerance: psum-reductions == global reductions."""
    cfg, scene, mc, state, optimizers = setup
    mesh = make_mesh(8)
    batch = {k: jnp.asarray(v) for k, v in
             batch_for_frame(scene, 1, rng=np.random.RandomState(0)).items()}
    weights = {k: jnp.asarray(1.0) for k in
               ["rgb_weight", "depth_weight", "pc_weight", "rgb_s_weight",
                "depth_consistency_weight", "weight_dist_2nd_loss",
                "weight_dist_1st_loss", "t_cycle_weight"]}
    ray_idx = jnp.arange(128)
    key = jax.random.key(7)

    import functools
    vg_single = jax.jit(jax.value_and_grad(
        functools.partial(compute_step_loss, mc=mc, rgb_loss_type="l2", mesh=None),
        has_aux=True))
    vg_mesh = jax.jit(jax.value_and_grad(
        functools.partial(compute_step_loss, mc=mc, rgb_loss_type="l2", mesh=mesh),
        has_aux=True))
    (loss_s, ld_s), grads_s = vg_single(state.params, batch, weights=weights,
                                        ray_idx=ray_idx, key=key)
    (loss_m, ld_m), grads_m = vg_mesh(state.params, batch, weights=weights,
                                      ray_idx=ray_idx, key=key)

    np.testing.assert_allclose(float(loss_s), float(loss_m), rtol=2e-5)
    for term in ["loss_rgb", "loss_depth", "l2_mean", "loss_pc", "loss_rgb_s"]:
        np.testing.assert_allclose(float(ld_s[term]), float(ld_m[term]), rtol=2e-5,
                                   err_msg=term)
    flat_s = jax.tree_util.tree_leaves(grads_s)
    flat_m = jax.tree_util.tree_leaves(grads_m)
    for a, b in zip(flat_s, flat_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=1e-6)


def test_sharded_trainer_converges(setup):
    cfg, scene, mc, state, optimizers = setup
    mesh = make_mesh(8)
    trainer = Trainer(cfg, mc, optimizers, mesh=mesh)
    rng = np.random.RandomState(1)
    losses = []
    for ep in range(20):
        for i in range(scene.n_frames):
            batch = batch_for_frame(scene, i, rng=rng)
            state, ld = trainer.step(state, batch, epoch=ep, scheduling_start=10000)
            losses.append(float(ld["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-8:]) < 0.7 * np.mean(losses[:8])


def test_sharded_fused_train_kernel_matches_single_chip():
    """The single-kernel fused loss path (render_ray_loss_fused) inside the
    ray-sharded shard_map: per-shard kernels + psum'd count/total/sums must
    reproduce the single-chip fused values and grads (this is the path a pod
    slice runs — bench.py auto-meshes when >1 device is present)."""
    import functools

    cfg = load_config(overrides={
        "model": {"hidden_dim": 128},
        "rendering": {"num_points": 128},
        "training": {"n_training_points": 64, "pc_ratio": 4},
        "pose": {"learn_pose": True, "init_pose": True},
    })
    scene = SceneData.from_dict(dict(make_synthetic_scene(n_frames=3, h=16, w=24)))
    mc = ModelConfigs.from_cfg(cfg, num_cams=scene.n_frames)
    mc = type(mc)(**{**mc.__dict__, "chamfer_tile": 64, "stratified_noise": False})
    assert mc.nerf.use_pallas
    state, _ = create_train_state(jax.random.key(0), mc,
                                  init_c2w=jnp.asarray(scene.c2ws_gt))
    mesh = make_mesh(8)
    batch = {k: jnp.asarray(v) for k, v in
             batch_for_frame(scene, 1, rng=np.random.RandomState(0)).items()}
    weights = {k: jnp.asarray(1.0) for k in
               ["rgb_weight", "depth_weight", "pc_weight", "rgb_s_weight",
                "depth_consistency_weight", "weight_dist_2nd_loss",
                "weight_dist_1st_loss", "t_cycle_weight"]}
    ray_idx = jnp.arange(64) * 5
    key = jax.random.key(7)

    from jax.experimental.pallas import tpu as pltpu

    outs = {}
    for name, m in (("single", None), ("mesh", mesh)):
        vg = jax.value_and_grad(functools.partial(
            compute_step_loss, mc=mc, rgb_loss_type="l2", mesh=m), has_aux=True)
        with pltpu.force_tpu_interpret_mode():
            (loss, ld), grads = vg(state.params, batch, weights, ray_idx, key)
        assert "loss_rgb" in ld
        outs[name] = (float(loss), grads)

    l_s, g_s = outs["single"]
    l_m, g_m = outs["mesh"]
    np.testing.assert_allclose(l_s, l_m, rtol=2e-5, atol=2e-5)
    errs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))
                           / max(float(np.max(np.abs(np.asarray(a)))), 1e-12)),
        g_s, g_m)
    assert max(jax.tree.leaves(errs)) < 5e-5, errs
