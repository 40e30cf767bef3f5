"""Benchmark: full training-step throughput at the reference workload shape.

Workload (BASELINE.md): 1024 rays/step, 128 samples/ray, 256-wide 9-layer MLP,
V-KITTI resolution 621x188, full NoPe-NeRF loss stack (rgb + depth + Chamfer +
photometric warp) with learned poses and distortions — i.e. the reference's
`Trainer.train_step` (model/training.py:70-100), fwd+bwd+4 Adam updates.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is null: the reference publishes no numbers (BASELINE.json published={}).

Robustness (the round-1 driver run died at rc=124 before printing): on this
image the TPU is reached through a tunnel whose first execution/readback of a
program sporadically stalls for minutes (measured 0.2 s .. 280 s for the same
program), independent of compile time. Counter-measures here:
  * persistent compilation cache in .jax_cache/ (compile becomes ~0.02 s when
    warm; the cache directory is committed so driver runs start warm),
  * exactly ONE warmup sync and ONE timed trial before the JSON line can be
    printed — the minimum number of stall opportunities,
  * a wall-clock deadline: extra refinement trials run only with time left,
    and the JSON line is printed the moment the deadline would be at risk.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

T_START = time.perf_counter()
# Print the JSON line once the process is this old, even if refinement
# trials remain. The driver budget is unknown; round 1 died at >550 s with
# tunnel stalls of up to ~280 s observed, so leave headroom for one stall.
DEADLINE_S = 150.0


def _elapsed() -> float:
    return time.perf_counter() - T_START


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: reruns (and driver runs after this round's
    # commits) skip XLA compilation entirely.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

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

    def run_epochs(state, n):
        lds = None
        for _ in range(n):
            state, lds = trainer.run_steps(state, scene, order, refs, epoch=0,
                                           scheduling_start=10000)
        # block_until_ready does not reliably block on this transport; end
        # every batch with a host readback of a data-dependent scalar.
        last = float(lds["loss"][-1])
        return state, last

    # ONE warmup batch: absorbs compile (cache-hit ~0.02 s) plus the tunnel's
    # one-off first-execution penalty.
    state, _ = run_epochs(state, 1)
    print(f"# warmup done at t={_elapsed():.1f}s", file=sys.stderr)

    n_steps = 100
    trials = []
    t0 = time.perf_counter()
    state, last = run_epochs(state, n_steps // epoch_len)
    trials.append(time.perf_counter() - t0)

    # Refinement: only while comfortably inside the deadline.
    while len(trials) < 5 and _elapsed() + 3 * trials[-1] < DEADLINE_S:
        t0 = time.perf_counter()
        state, last = run_epochs(state, n_steps // epoch_len)
        trials.append(time.perf_counter() - t0)

    dt = min(trials)
    rays_per_s = n_steps * n_rays / dt
    print(json.dumps({
        "metric": "rays/s/chip full train step (fwd+bwd, all losses)",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": None,
    }))
    sys.stdout.flush()
    print(f"# {len(trials)} trials of {n_steps} steps, best {dt:.2f}s = "
          f"{n_steps/dt:.2f} steps/s, loss={last:.4f}, total t={_elapsed():.1f}s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
