"""Worker for the REAL multi-process test (test_multiprocess.py): one of
`num_processes` JAX processes, each owning 2 virtual CPU devices, jointly
running the full sharded train step over the GLOBAL mesh.

Usage: python multiprocess_worker.py <process_id> <num_processes> <port> \
           [mode] [outdir]
mode 'train' (default) prints one line:
    MP_RESULT <process_id> <loss> <l2_mean> <nerf_grad_like_sum>
mode 'eval' runs the multi-host tiled full-frame eval render
(Trainer.render_frame_multihost): each process renders its disjoint row slab,
the assembled frame is allgathered, and every process writes
<outdir>/frame_<pid>.npz (rgb, depth) plus its own raw tile.
mode 'ckpt' exercises checkpoint/resume across processes (process-0 write
gate + both-process restore; VERDICT round-3 item 7): a 2-step train +
save + restore + 2-step continuation must equal an uninterrupted 4-step run,
identically on both processes. It then runs two scan-fused test-time
pose-opt epochs (evaluation/pose_opt.py) under the same 2-process setup and
prints the learned-pose checksum. Output:
    MP_CKPT <pid> <resumed_loss> <straight_loss> <resumed_wsum> \
        <straight_wsum> <poseopt_sum>
"""

import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "train"
    outdir = sys.argv[5] if len(sys.argv) > 5 else None
    local_devices = 2
    # ours must come LAST: with repeated flags XLA honors the final one (the
    # pytest parent exports ...=8 for its own virtual mesh)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * local_devices

    import jax.numpy as jnp
    import numpy as np

    from nope_nerf_tpu.config import load_config
    from nope_nerf_tpu.data import SceneData, batch_for_frame, make_synthetic_scene
    from nope_nerf_tpu.parallel import (
        globalize_replicated,
        host_frame_schedule,
        make_mesh,
    )
    from nope_nerf_tpu.training import ModelConfigs, Trainer, create_train_state

    # every host builds the IDENTICAL scene/state from the shared seed
    cfg = load_config(overrides={
        "model": {"hidden_dim": 32},
        "rendering": {"num_points": 16},
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

    if mode == "eval":
        # Multi-host tiled eval render (render_frame_multihost): host-local
        # state/params (replicated values, no global-mesh program — the tiled
        # render is embarrassingly parallel; only the assembly allgathers).
        from nope_nerf_tpu.parallel import host_image_tiles
        h, w = 24, 32
        batch = {k: jnp.asarray(v)
                 for k, v in batch_for_frame(
                     scene, 1, rng=np.random.RandomState(3)).items()}
        local_trainer = Trainer(cfg, mc, optimizers)
        frame = local_trainer.render_frame_multihost(state, batch, (h, w),
                                                     chunk=256)
        lo, hi = host_image_tiles(h)
        tile = local_trainer.render_frame(state, batch, (h, w),
                                          chunk=256, rows=(lo, hi))
        np.savez(os.path.join(outdir, f"frame_{pid}.npz"),
                 rgb=frame["rgb"], depth=frame["depth"],
                 tile_rgb=tile["rgb"], tile_lo=lo, tile_hi=hi)
        print(f"MP_RESULT {pid} ok", flush=True)
        return

    mesh = make_mesh(nproc * local_devices)  # the GLOBAL mesh, spanning hosts
    trainer = Trainer(cfg, mc, optimizers, mesh=mesh)

    if mode == "ckpt":
        from jax.experimental import multihost_utils

        from nope_nerf_tpu.training.checkpoints import (load_checkpoint,
                                                        save_checkpoint)

        def globalize_state(st):
            return type(st)(
                params=globalize_replicated(st.params, mesh),
                opt_state=globalize_replicated(st.opt_state, mesh),
                it=globalize_replicated(st.it, mesh),
                rng=jax.random.wrap_key_data(
                    globalize_replicated(jax.random.key_data(st.rng), mesh)))

        order = host_frame_schedule(3, epoch=0, seed=5)
        rng = np.random.RandomState(0)
        batches = [{k: jnp.asarray(v) for k, v in
                    batch_for_frame(scene, int(f), rng=rng).items()}
                   for f in (list(order) + list(order))[:4]]

        def run(st, bs):
            ld = None
            for b in bs:
                st, ld = trainer.step(st, globalize_replicated(b, mesh),
                                      epoch=0, scheduling_start=10000)
            return st, ld

        # branch A: 4 uninterrupted steps
        stA, ldA = run(globalize_state(state), batches)
        # branch B: 2 steps, process-0 checkpoints, BOTH restore, 2 more
        stB, _ = run(globalize_state(state), batches[:2])
        save_checkpoint(outdir, "model.ckpt", stB, {"epoch": 1})
        multihost_utils.sync_global_devices("ckpt-written")
        fresh, _ = create_train_state(jax.random.key(7), mc,
                                      init_c2w=jnp.asarray(scene.c2ws_gt))
        restored, scalars = load_checkpoint(outdir, "model.ckpt", fresh)
        assert scalars["epoch"] == 1
        stB, ldB = run(globalize_state(restored), batches[2:])

        wA = float(jnp.sum(jnp.abs(stA.params["nerf"]["density_w"])))
        wB = float(jnp.sum(jnp.abs(stB.params["nerf"]["density_w"])))

        # scan-fused test-time pose opt under 2 processes (replicated local
        # computation; must be deterministic and identical across processes)
        from nope_nerf_tpu.evaluation.pose_opt import optimize_test_poses
        eval_scene = SceneData.from_dict(
            dict(make_synthetic_scene(n_frames=2, h=24, w=32)))
        _, c2ws = optimize_test_poses(
            jax.device_get(stA.params["nerf"]), None, eval_scene,
            mc.nerf, mc.render, init_c2ws=eval_scene.c2ws_gt,
            n_points=32, n_epochs=2, log_every=0)
        psum = float(np.sum(np.abs(c2ws)))
        print(f"MP_CKPT {pid} {float(ldB['loss']):.8f} "
              f"{float(ldA['loss']):.8f} {wB:.6f} {wA:.6f} {psum:.6f}",
              flush=True)
        return

    # every jit input must be a GLOBAL array in multi-process mode; all values
    # are identical across hosts, so replicate them (key arrays via key_data)
    state = type(state)(
        params=globalize_replicated(state.params, mesh),
        opt_state=globalize_replicated(state.opt_state, mesh),
        it=globalize_replicated(state.it, mesh),
        rng=jax.random.wrap_key_data(
            globalize_replicated(jax.random.key_data(state.rng), mesh)))

    order = host_frame_schedule(3, epoch=0, seed=5)  # identical on every host
    rng = np.random.RandomState(0)
    for frame in order[:2]:
        batch = {k: jnp.asarray(v)
                 for k, v in batch_for_frame(scene, int(frame), rng=rng).items()}
        gbatch = globalize_replicated(batch, mesh)
        state, ld = trainer.step(state, gbatch, epoch=0, scheduling_start=10000)
    wsum = float(jnp.sum(jnp.abs(state.params["nerf"]["density_w"])))
    print(f"MP_RESULT {pid} {float(ld['loss']):.8f} {float(ld['l2_mean']):.8f} "
          f"{wsum:.6f}", flush=True)


if __name__ == "__main__":
    main()
