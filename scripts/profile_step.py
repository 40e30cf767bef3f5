"""Break down train-step time: full step vs render-only vs scan-fused steps."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp

from nope_nerf_tpu.config import load_config
from nope_nerf_tpu.data import SceneData, batch_for_frame, make_synthetic_scene
from nope_nerf_tpu.training import ModelConfigs, Trainer, create_train_state
from nope_nerf_tpu.training.trainer import train_step, compute_step_loss

h, w = 188, 621
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
batches = [{k: jnp.asarray(v) for k, v in batch_for_frame(scene, i, rng=rng).items()}
           for i in range(scene.n_frames)]

def timeit(name, fn, n=100):
    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:8.3f} ms/iter")
    return dt

# 1. full step (current path)
s = state
def full():
    global s
    s, ld = trainer.step(s, batches[0], epoch=0, scheduling_start=10000)
    return ld["loss"]
timeit("full train_step", full)

# 2. grad-only (no optimizer update)
weights, lrs, rlt = trainer._sched_cache[(0, 10000)]
gradfn = jax.jit(functools.partial(
    lambda p, b, w, k: jax.grad(compute_step_loss, has_aux=True)(
        p, b, w, jnp.arange(n_rays), k, mc, "l2", None)))
key = jax.random.key(1)
def gonly():
    g, ld = gradfn(state.params, batches[0], weights, key)
    return ld["loss"]
timeit("grad only (no opt)", gonly)

# 3. forward only
fwd = jax.jit(lambda p, b, w, k: compute_step_loss(
    p, b, w, jnp.arange(n_rays), k, mc, "l2", None)[0])
timeit("forward only", lambda: fwd(state.params, batches[0], weights, key))

# 4. scan-fused K steps in one dispatch
K = 16
def body(carry, xs):
    st = carry
    st, ld = train_step(st, batches[0], weights, lrs, mc, rlt,
                        trainer.optimizers, None)
    return st, ld["loss"]

@jax.jit
def scanK(st):
    st, losses = jax.lax.scan(body, st, None, length=K)
    return st, losses

st2, _ = scanK(state)
jax.block_until_ready(st2.params["nerf"])
t0 = time.perf_counter()
N = 10
for _ in range(N):
    st2, losses = scanK(st2)
jax.block_until_ready(losses)
dt = (time.perf_counter() - t0) / (N * K)
print(f"{'scan-fused step (K=16)':40s} {dt*1e3:8.3f} ms/step")
