"""Measure the eval noaux kernel at the full-frame workload (188x621 x 128
samples, exact math — the enc-major multi-chain kernel). Prints ms/frame and
Mrays/s, two ways:

- pipelined (5 frames per readback): DEVICE time per frame — what production
  multi-frame rendering pays (Trainer.render_frame(sync=False) overlaps the
  next frame's compute with this frame's readback for exactly this reason).
- single-dispatch: one dispatch + readback per frame — includes this image's
  ~20-30 ms tunnel round-trip, NOT device work. Round-4's quoted 150-155
  ms/frame was this number; the device time underneath was ~128 ms.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from nope_nerf_tpu.models.nerf import NerfConfig, init_nerf_params
from nope_nerf_tpu.ops.pallas_render import pack_rays, render_rays_fused_noaux

H, W, S = 188, 621, 128
N = H * W
NP_ = -(-N // 8) * 8  # the kernel pads to TILE_FWD internally

cfg = NerfConfig(use_pallas=True)
key = jax.random.key(0)
params = init_nerf_params(key, cfg)

k1, k2, k3 = jax.random.split(key, 3)
origin = jax.random.normal(k1, (3,))
ray_vec = jax.random.normal(k2, (NP_, 3))
ray_vec = ray_vec / jnp.linalg.norm(ray_vec, axis=-1, keepdims=True)
rays = pack_rays(origin, ray_vec, -ray_vec)
z = jnp.broadcast_to(jnp.linspace(0.01, 10.0, S), (NP_, S))

f = jax.jit(lambda p, r, zz: render_rays_fused_noaux(p, r, zz, cfg, False))
out = f(params, rays, z)
_ = float(out[0][0, 0])  # force readback (block_until_ready unreliable here)

best_pipe = np.inf
for _i in range(4):
    t0 = time.perf_counter()
    for _j in range(5):
        out = f(params, rays, z)
    _ = float(out[0][-1, -1])
    best_pipe = min(best_pipe, (time.perf_counter() - t0) / 5)

best_one = np.inf
for _i in range(7):
    t0 = time.perf_counter()
    out = f(params, rays, z)
    _ = float(out[0][-1, -1])
    best_one = min(best_one, time.perf_counter() - t0)

print(f"exact enc-major, pipelined (device): {best_pipe*1e3:7.1f} ms/frame  "
      f"{N/best_pipe/1e6:.3f} Mrays/s")
print(f"exact enc-major, single-dispatch:    {best_one*1e3:7.1f} ms/frame  "
      f"{N/best_one/1e6:.3f} Mrays/s  (includes tunnel round-trip)")
