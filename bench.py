"""Benchmark: full training-step throughput at the reference workload shape.

Workload (BASELINE.md): 1024 rays/step, 128 samples/ray, 256-wide 9-layer MLP,
V-KITTI resolution 621x188, full NoPe-NeRF loss stack (rgb + depth + Chamfer +
photometric warp) with learned poses and distortions — i.e. the reference's
`Trainer.train_step` (model/training.py:70-100), fwd+bwd+4 Adam updates.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is null: the reference publishes no numbers (BASELINE.json published={}).

Robustness: on this image the TPU is reached through a tunnel whose first
execution/readback of a program sporadically stalls for minutes (measured
0.2 s .. 343 s for the same program), independent of compile time — and a
Python thread blocked inside a device readback cannot be interrupted, so a
same-process deadline can only fire BETWEEN steps (the round-2 bench's tail
shows warmup stalling until t=343 s with the 150 s deadline helpless).
Counter-measures:
  * persistent compilation cache in .jax_cache/ (compile ~0.02 s when warm;
    the cache directory is committed so driver runs start warm),
  * the measurement runs in a CHILD process that streams every completed
    result (warmup, each trial) to this watchdog parent over a pipe;
  * the parent owns the wall clock: at the deadline it emits the JSON from
    whatever completed and kills the child — a readback stalled in the child
    can no longer blow the whole budget;
  * if NOTHING (not even warmup) completed by NOPE_BENCH_RETRY_S, the child is
    killed and ONE fresh child is spawned — stalls are connection-level and a
    new process opens a new tunnel connection (round-3 observation: one
    process' first readback of a trivial program hung past 520 s). Only if
    nothing ever completes does the parent emit value null at the last-resort
    deadline (still rc=0, so the attempt is recorded).

Self-tests: NOPE_BENCH_INJECT_STALL_S=300 makes the child hang after its first
trial; NOPE_BENCH_INJECT_PREWARMUP_STALL_S hangs the FIRST child before
warmup (exercising the retry). Either way the parent must print a numeric
JSON line and exit 0 (tests/test_aux.py::test_bench_watchdog*).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

T_START = time.perf_counter()
# Parent-enforced deadline: emit the JSON once this old if >=1 trial landed.
DEADLINE_S = float(os.environ.get("NOPE_BENCH_DEADLINE_S", 280.0))
# If NOTHING completed (stalled warmup), keep hoping until this, then emit null.
LAST_RESORT_S = float(os.environ.get("NOPE_BENCH_LAST_RESORT_S", 520.0))
# If NOTHING (not even warmup) completed by this, kill the child and start a
# fresh one: tunnel stalls are connection-level, and a new process opens a new
# connection (observed: one process' first readback hung >520 s while the
# chip was otherwise healthy). One retry only; the fresh child still has
# LAST_RESORT_S - RETRY_S to produce a trial.
RETRY_S = float(os.environ.get("NOPE_BENCH_RETRY_S", 210.0))


def _elapsed() -> float:
    return time.perf_counter() - T_START


def _measure(conn, attempt: int = 0) -> None:
    """Child process: run the benchmark, streaming every completed result."""
    # Self-test hook for the stalled-warmup retry path: the FIRST child hangs
    # before ever touching jax; the retry child must complete normally.
    pre = float(os.environ.get("NOPE_BENCH_INJECT_PREWARMUP_STALL_S", 0.0))
    if pre and attempt == 0:
        time.sleep(pre)

    import numpy as np

    import jax

    # Self-test hook: the image's sitecustomize pins the tunneled TPU backend
    # regardless of JAX_PLATFORMS, so the CPU watchdog tests must override via
    # jax.config (env vars are too late — see .claude/skills/verify).
    if os.environ.get("NOPE_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["NOPE_BENCH_PLATFORM"])

    import jax.numpy as jnp

    # Persistent compile cache: reruns (and driver runs after this round's
    # commits) skip XLA compilation entirely.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from nope_nerf_tpu.config import load_config
    from nope_nerf_tpu.data import (SceneData, epoch_order,
                                    make_synthetic_scene)
    from nope_nerf_tpu.training import (ModelConfigs, Trainer,
                                        create_train_state)

    # NOPE_BENCH_TINY: CPU-runnable watchdog self-test shape (tests/test_aux.py)
    tiny = bool(os.environ.get("NOPE_BENCH_TINY"))
    h, w = (24, 32) if tiny else (188, 621)  # V-KITTI at resize_factor 2
    n_rays = 64 if tiny else 1024

    cfg = load_config(overrides={
        "training": {"n_training_points": n_rays},
        "pose": {"learn_pose": True, "init_pose": True},
        **({"tpu": {"use_pallas_renderer": False}} if tiny else {}),
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
    epoch_len = 10 if tiny else 50  # steps per dispatch (one production epoch
    # of a 50-frame scene); n_steps must be a multiple
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
    conn.send(("warmup", _elapsed()))

    n_steps = 20 if tiny else 100
    inject = float(os.environ.get("NOPE_BENCH_INJECT_STALL_S", 0.0))
    for trial in range(5):
        t0 = time.perf_counter()
        state, last = run_epochs(state, n_steps // epoch_len)
        dt = time.perf_counter() - t0
        conn.send(("trial", {"dt": dt, "n_steps": n_steps, "n_rays": n_rays,
                             "loss": last}))
        if inject:  # watchdog self-test: simulate a readback stall
            time.sleep(inject)
    conn.send(("done", None))
    conn.close()


def _emit(trials) -> None:
    if trials:
        best = min(t["dt"] for t in trials)
        t0 = trials[0]
        value = round(t0["n_steps"] * t0["n_rays"] / best, 1)
        note = (f"# {len(trials)} trials of {t0['n_steps']} steps, best "
                f"{best:.2f}s = {t0['n_steps']/best:.2f} steps/s, "
                f"loss={t0['loss']:.4f}, total t={_elapsed():.1f}s")
    else:
        value = None
        note = f"# no trial completed before t={_elapsed():.1f}s (stall)"
    print(json.dumps({
        "metric": "rays/s/chip full train step (fwd+bwd, all losses)",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": None,
    }))
    sys.stdout.flush()
    print(note, file=sys.stderr)


T_WALL_START = time.time()


def _compiled_anything() -> bool:
    """True if the persistent compile cache gained/updated ANY entry after
    this bench started — i.e. the child reached the backend and is (or was)
    compiling, so the tunnel works and the time is legitimately spent (a
    cold-cache run compiles for minutes between cache writes; killing it
    discards the in-flight compile). The retry targets the OTHER failure
    mode: a connection-level stall, where nothing ever completes — in the
    production (warm committed cache) configuration warmup compiles nothing,
    so a zero-writes hang is a stall, not work."""
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        for name in os.listdir(cache):
            if os.path.getmtime(os.path.join(cache, name)) >= T_WALL_START:
                return True
    except OSError:
        pass
    return False


def _spawn(ctx, attempt: int = 0):
    parent, child = ctx.Pipe(duplex=False)
    proc = ctx.Process(target=_measure, args=(child, attempt), daemon=True)
    proc.start()
    child.close()
    return parent, proc


def _stop(proc) -> None:
    if proc.is_alive():
        proc.terminate()  # exact child PID — never a pattern kill
        proc.join(timeout=5.0)
        if proc.is_alive():
            proc.kill()


def main() -> None:
    ctx = mp.get_context("spawn")  # fresh interpreter: no inherited jax state
    parent, proc = _spawn(ctx)

    trials = []
    saw_any = False  # any completed result (warmup counts) from any child
    retried = False
    while True:
        if trials and _elapsed() >= DEADLINE_S:
            break
        if _elapsed() >= LAST_RESORT_S:
            break
        hold = False
        if not saw_any and not retried and _elapsed() >= RETRY_S:
            if _compiled_anything():
                # the child reached the backend and is compiling (cold
                # cache), not stalled — killing it would discard the
                # in-flight compile; hold on, but keep draining the pipe so
                # a child that later completes warmup/trials still lands its
                # results (a blind sleep here strands them until LAST_RESORT)
                hold = True
            else:
                # connection-level tunnel stall: retry once, fresh process
                print(f"# nothing completed by t={_elapsed():.1f}s; "
                      "restarting child (fresh tunnel connection)",
                      file=sys.stderr)
                _stop(proc)
                parent, proc = _spawn(ctx, attempt=1)
                retried = True
                continue
        timeout = max(0.2, (DEADLINE_S if trials else LAST_RESORT_S)
                      - _elapsed())
        if not saw_any and not retried and not hold:
            timeout = max(0.2, min(timeout, RETRY_S - _elapsed()))
        if not parent.poll(min(timeout, 5.0)):
            if not proc.is_alive() and not parent.poll(0):
                if retried or trials:
                    break  # child died (its exit shows via missing 'done')
                _stop(proc)
                parent, proc = _spawn(ctx, attempt=1)  # crashed: one retry
                retried = True
            continue
        try:
            kind, payload = parent.recv()
        except EOFError:
            break
        saw_any = True
        if kind == "warmup":
            print(f"# warmup done at t={payload:.1f}s", file=sys.stderr)
        elif kind == "trial":
            trials.append(payload)
        elif kind == "done":
            break

    _emit(trials)
    _stop(proc)


if __name__ == "__main__":
    main()
