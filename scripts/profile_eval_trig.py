"""Measure the eval noaux kernel at the full-frame workload: exact trig vs the
fast_trig variants (phase-folded single pass / lane-packed). Prints ms/frame,
Mrays/s, max |rgb| deviation, and the PSNR shift of the rendered frame."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from nope_nerf_tpu.models.nerf import NerfConfig, init_nerf_params
from nope_nerf_tpu.ops.pallas_render import pack_rays, render_rays_fused_noaux

H, W, S = 188, 621, 128
N = H * W
NP_ = -(-N // 8) * 8  # pad to ray-tile multiple

cfg = NerfConfig(use_pallas=True)
key = jax.random.key(0)
params = init_nerf_params(key, cfg)

k1, k2, k3 = jax.random.split(key, 3)
origin = jax.random.normal(k1, (3,))
ray_vec = jax.random.normal(k2, (NP_, 3))
ray_vec = ray_vec / jnp.linalg.norm(ray_vec, axis=-1, keepdims=True)
rays = pack_rays(origin, ray_vec, -ray_vec)
z = jnp.broadcast_to(jnp.linspace(0.01, 10.0, S), (NP_, S))


def run(fast_trig, n=5):
    f = jax.jit(lambda p, r, zz: render_rays_fused_noaux(
        p, r, zz, cfg, False, fast_trig))
    out = f(params, rays, z)
    _ = float(out[0][0, 0])  # force readback (block_until_ready unreliable here)
    best = np.inf
    for _i in range(n):
        t0 = time.perf_counter()
        out = f(params, rays, z)
        _ = float(out[0][-1, -1])
        best = min(best, time.perf_counter() - t0)
    return out, best


(rgb0, d0), t0 = run(0)
print(f"exact      : {t0*1e3:7.1f} ms/frame  {N/t0/1e6:.3f} Mrays/s")
for ft in (1, 2):
    (rgb, d), t = run(ft)
    dev = float(jnp.max(jnp.abs(rgb - rgb0)))
    ddev = float(jnp.max(jnp.abs(d - d0)))
    mse0 = float(jnp.mean((rgb0 - jnp.clip(rgb0 + 0.1, 0, 1)) ** 2))
    # PSNR of each variant against a common pseudo-GT (shifted render)
    gt = jnp.clip(rgb0 + 0.1, 0.0, 1.0)
    p0 = -10 * np.log10(float(jnp.mean((rgb0 - gt) ** 2)))
    p1 = -10 * np.log10(float(jnp.mean((rgb - gt) ** 2)))
    print(f"fast_trig={ft}: {t*1e3:7.1f} ms/frame  {N/t/1e6:.3f} Mrays/s  "
          f"max|drgb|={dev:.2e} max|ddist|={ddev:.2e} dPSNR={abs(p1-p0):.2e} dB")
