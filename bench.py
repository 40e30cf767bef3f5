"""Benchmark: full training-step throughput at the reference workload shape.

Workload (BASELINE.md): 1024 rays/step, 128 samples/ray, 256-wide 9-layer MLP,
V-KITTI resolution 621x188, full NoPe-NeRF loss stack (rgb + depth + Chamfer +
photometric warp) with learned poses and distortions — i.e. the reference's
`Trainer.train_step` (model/training.py:70-100), fwd+bwd+4 Adam updates.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is null: the reference publishes no numbers (BASELINE.json published={}).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from nope_nerf_tpu.config import load_config
    from nope_nerf_tpu.data import SceneData, batch_for_frame, make_synthetic_scene
    from nope_nerf_tpu.training import ModelConfigs, Trainer, create_train_state

    h, w = 188, 621  # V-KITTI at resize_factor 2 (BASELINE.md)
    n_rays = 1024

    cfg = load_config(overrides={
        "training": {"n_training_points": n_rays},
        "pose": {"learn_pose": True, "init_pose": True},
    })
    scene = SceneData.from_dict(dict(make_synthetic_scene(n_frames=4, h=h, w=w)))
    mc = ModelConfigs.from_cfg(cfg, num_cams=scene.n_frames)
    state, optimizers = create_train_state(jax.random.key(0), mc,
                                           init_c2w=jnp.asarray(scene.c2ws_gt))
    trainer = Trainer(cfg, mc, optimizers)

    rng = np.random.RandomState(0)
    batches = [{k: jnp.asarray(v) for k, v in
                batch_for_frame(scene, i, rng=rng).items()}
               for i in range(scene.n_frames)]

    # warmup/compile
    state, ld = trainer.step(state, batches[0], epoch=0, scheduling_start=10000)
    float(ld["loss"])

    n_steps = 100
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, ld = trainer.step(state, batches[i % len(batches)], epoch=0,
                                 scheduling_start=10000)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    rays_per_s = n_steps * n_rays / dt
    print(json.dumps({
        "metric": "rays/s/chip full train step (fwd+bwd, all losses)",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": None,
    }))
    print(f"# {n_steps} steps in {dt:.2f}s = {n_steps/dt:.2f} steps/s, "
          f"loss={float(ld['loss']):.4f}", file=sys.stderr)


if __name__ == "__main__":
    main()
