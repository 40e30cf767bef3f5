"""Marginal-cost ablation of the train step's non-kernel glue (VERDICT r2
item 4): times the scan-fused epoch at the BASELINE workload with one thing
toggled at a time. Run on the real chip. Optionally dumps a profiler trace
(PROFILE_DIR=/tmp/trace python scripts/profile_glue.py)."""
import dataclasses
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from nope_nerf_tpu.config import load_config
from nope_nerf_tpu.data import SceneData, epoch_order, make_synthetic_scene
from nope_nerf_tpu.training import ModelConfigs, Trainer, create_train_state

h, w, n_rays = 188, 621, 1024
cfg = load_config(overrides={
    "training": {"n_training_points": n_rays},
    "pose": {"learn_pose": True, "init_pose": True},
})
scene = SceneData.from_dict(
    dict(make_synthetic_scene(n_frames=4, h=h, w=w))).to_device()
base_mc = ModelConfigs.from_cfg(cfg, num_cams=scene.n_frames)
order, refs = epoch_order(scene.n_frames, shuffle=True, seed=0)
order = np.resize(order, 50)
refs = np.resize(refs, 50)


def measure(name, mc, n_steps=100, trials=3):
    state, optimizers = create_train_state(jax.random.key(0), mc,
                                           init_c2w=jnp.asarray(scene.c2ws_gt))
    trainer = Trainer(cfg, mc, optimizers)
    trainer.mc = mc

    def run(state, n):
        lds = None
        for _ in range(n):
            state, lds = trainer.run_steps(state, scene, order, refs, epoch=0,
                                           scheduling_start=10000)
        return state, float(lds["loss"][-1])

    state, _ = run(state, 1)  # warmup (compile + first-dispatch)
    best = np.inf
    for _ in range(trials):
        t0 = time.perf_counter()
        state, last = run(state, n_steps // 50)
        best = min(best, time.perf_counter() - t0)
    ms = best / n_steps * 1e3
    print(f"{name:44s} {ms:7.3f} ms/step  {n_rays/ms*1e3/1e3:7.1f}k rays/s "
          f"(loss={last:.4f})")
    return ms


base = measure("full baseline", base_mc)

loss_no_pc = dataclasses.replace(base_mc.loss, use_pc=False)
measure("pc (Chamfer pipeline) off", dataclasses.replace(base_mc, loss=loss_no_pc))

loss_no_s = dataclasses.replace(base_mc.loss, use_rgb_s=False)
measure("rgb_s (photometric warp) off", dataclasses.replace(base_mc, loss=loss_no_s))

loss_none = dataclasses.replace(base_mc.loss, use_pc=False, use_rgb_s=False)
measure("both off", dataclasses.replace(base_mc, loss=loss_none))

measure("pallas chamfer kernel",
        dataclasses.replace(base_mc, use_pallas_chamfer=True))

measure("chamfer_tile=1024", dataclasses.replace(base_mc, chamfer_tile=1024))
measure("chamfer_tile=2048", dataclasses.replace(base_mc, chamfer_tile=2048))

if os.environ.get("PROFILE_DIR"):
    mc = base_mc
    state, optimizers = create_train_state(jax.random.key(0), mc,
                                           init_c2w=jnp.asarray(scene.c2ws_gt))
    trainer = Trainer(cfg, mc, optimizers)
    state, lds = trainer.run_steps(state, scene, order, refs, 0, 10000)
    _ = float(lds["loss"][-1])
    with jax.profiler.trace(os.environ["PROFILE_DIR"]):
        for _ in range(3):
            state, lds = trainer.run_steps(state, scene, order, refs, 0, 10000)
        _ = float(lds["loss"][-1])
    print("trace written to", os.environ["PROFILE_DIR"])
