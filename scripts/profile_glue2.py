"""Component-level timing of the train-step glue at BASELINE shapes: each
candidate op is run 100x inside ONE jitted lax.scan (outputs chained into the
carry so XLA can't dead-code or overlap across iterations), amortizing the
tunnel dispatch/readback. Run on the real chip."""
import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from nope_nerf_tpu.geometry.camera import (camera_matrix_from_focal,
                                           pixel_grid, project_to_cam,
                                           transform_to_world)
from nope_nerf_tpu.ops.chamfer import _nearest_idx_bidirectional, chamfer_loss
from nope_nerf_tpu.ops.interp import (get_tensor_values, resize_area,
                                      resize_bilinear, resize_nearest)
from nope_nerf_tpu.training.trainer import _draw_rays
from nope_nerf_tpu.utils.safemath import safe_norm

H, W = 188, 621
SH, SW = H // 4, W // 4
S = SH * SW  # 7332
key = jax.random.key(0)
ks = jax.random.split(key, 8)
x = jax.random.normal(ks[0], (S, 3))
y = x + 0.05 * jax.random.normal(ks[1], (S, 3))
img = jax.random.uniform(ks[2], (H, W, 3))
depth = 2.0 + jax.random.uniform(ks[3], (H, W))
cam = camera_matrix_from_focal(jnp.asarray(1.2), jnp.asarray(1.4))
_, p_pc = pixel_grid((SH, SW))
R = jnp.eye(3) + 0.01 * jax.random.normal(ks[4], (3, 3))
t = 0.1 * jax.random.normal(ks[5], (3,))


def run(name, fn, n=100):
    def body(c, _):
        return c + fn(c * 1e-20), None

    g = jax.jit(lambda: jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                                     None, length=n)[0])
    _ = float(g())
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(g())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best/n*1e3:7.3f} ms")


run("chamfer_loss fwd", lambda e: chamfer_loss(x + e, y))
run("chamfer_loss grad",
    lambda e: jax.grad(lambda xx: chamfer_loss(xx, y))(x + e)[0, 0])
run("bidirectional sweep (idx only)",
    lambda e: (_nearest_idx_bidirectional(x + e, y, 512)[0].astype(jnp.float32)
               .sum() * 1e-9))


def gather_norm(e):
    idx = jnp.arange(S) ^ 1  # fixed permutation stand-in
    return jnp.mean(safe_norm((x + e) - y[idx], axis=-1))


run("gather+norm+mean fwd", gather_norm)
run("gather+norm+mean grad",
    lambda e: jax.grad(lambda xx: jnp.mean(safe_norm(xx - y[jnp.arange(S) ^ 1],
                                                     axis=-1)))(x + e)[0, 0])


def seg(e):
    idx = jnp.arange(S) ^ 1
    return jax.ops.segment_sum(x + e, idx, num_segments=S)[0, 0]


run("segment_sum (S,3) -> S segments", seg)

run("resize_nearest (H,W)->(SH,SW) fwd",
    lambda e: resize_nearest(depth[..., None] + e, (SH, SW)).sum() * 1e-9)
run("resize_nearest grad",
    lambda e: jax.grad(lambda d: resize_nearest(d[..., None],
                                                (SH, SW)).sum())(depth + e)[0, 0]
    * 1e-9)
run("resize_bilinear img fwd",
    lambda e: resize_bilinear(img + e, (SH, SW)).sum() * 1e-9)
run("resize_area depth (H,W)->(H,W) [identity]",
    lambda e: resize_area(depth[..., None] + e, (H, W)).sum() * 1e-9)

run("transform_to_world 7332 pts fwd",
    lambda e: transform_to_world(p_pc, depth.reshape(-1, 1)[:S] + e, cam,
                                 jnp.eye(4)).sum() * 1e-9)


def warp_chain(e):
    img1s = resize_bilinear(img + e, (SH, SW))
    img2s = resize_bilinear(img, (SH, SW))
    rgb1 = get_tensor_values(img1s, p_pc, mode="bilinear", scale=False,
                             align_corners=True)
    pc1 = transform_to_world(p_pc, depth.reshape(-1, 1)[:S], cam, jnp.eye(4))
    pc1r = pc1 @ R.T + t
    pr, valid = project_to_cam(pc1r, cam)
    rgb2 = get_tensor_values(img2s, pr, mode="bilinear", scale=False,
                             align_corners=True)
    d = jnp.clip(jnp.abs(rgb1 - rgb2), 0, 1)
    m = jnp.broadcast_to(valid, d.shape)
    return jnp.sum(jnp.where(m, d, 0.0)) / jnp.maximum(m.sum(), 1.0)


run("warp chain fwd", warp_chain)
run("warp chain grad (wrt R-path input)",
    lambda e: jax.grad(warp_chain)(e))

run("_draw_rays 1024 of 116k",
    lambda e: _draw_rays(jax.random.key(3), H * W,
                         1024).astype(jnp.float32).sum() * 1e-9 + e * 0)
