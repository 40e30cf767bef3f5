"""Measure the eval noaux kernel at the full-frame workload (188x621 x 128
samples, exact math — the enc-major multi-chain kernel). Prints ms/frame and
Mrays/s. Round-4 note: the fast_trig approximations were removed once the
enc-major encoding made the exact path faster than any approximation was."""
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
best = np.inf
for _i in range(7):
    t0 = time.perf_counter()
    out = f(params, rays, z)
    _ = float(out[0][-1, -1])
    best = min(best, time.perf_counter() - t0)
print(f"exact enc-major: {best*1e3:7.1f} ms/frame  {N/best/1e6:.3f} Mrays/s")
