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
    scene = SceneData.from_dict(
        dict(make_synthetic_scene(n_frames=4, h=h, w=w))).to_device()
    mc = ModelConfigs.from_cfg(cfg, num_cams=scene.n_frames)
    state, optimizers = create_train_state(jax.random.key(0), mc,
                                           init_c2w=jnp.asarray(scene.c2ws_gt))
    mesh = None
    if len(jax.devices()) > 1:  # on a pod slice, shard the ray batch over ICI
        from nope_nerf_tpu.parallel import make_mesh
        mesh = make_mesh(len(jax.devices()))
    trainer = Trainer(cfg, mc, optimizers, mesh=mesh)

    # The production train path (cli/train with tpu.scan_steps, the default):
    # one lax.scan dispatch per epoch of full train steps.
    from nope_nerf_tpu.data import epoch_order
    epoch_len = 50  # steps per dispatch (one production epoch of a 50-frame
    # scene); n_steps must be a multiple
    order, refs = epoch_order(scene.n_frames, shuffle=True, seed=0)
    order = np.resize(order, epoch_len)
    refs = np.resize(refs, epoch_len)

    # Warmup: TWO batches — on this image's tunneled TPU the first post-compile
    # execution of a program carries a large one-off penalty, and
    # block_until_ready does not reliably block, so every timed batch must end
    # with a host readback (float()) of something data-dependent.
    for _ in range(2):
        state, lds = trainer.run_steps(state, scene, order, refs, epoch=0,
                                       scheduling_start=10000)
        float(lds["loss"][-1])

    n_steps = 100
    dt = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps // epoch_len):
            state, lds = trainer.run_steps(state, scene, order, refs, epoch=0,
                                           scheduling_start=10000)
        float(lds["loss"][-1])
        dt = min(dt, time.perf_counter() - t0)

    ld = {"loss": lds["loss"][-1]}
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
