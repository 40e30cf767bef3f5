#!/usr/bin/env python
"""Real-chip fused-vs-unfused kernel parity check (run after ANY kernel change).

The ≤5e-5 fused-vs-unfused parity tests (tests/test_pallas_render.py) run in
interpret mode on CPU; Mosaic-on-hardware can diverge from interpret mode after
a data-layout rewrite. This script repeats the comparisons ON THE LIVE TPU at
bench-scale workloads and fails loudly above tolerance:

  1. eval values: full-frame (188x621 rounded to 116744 rays x 128 samples)
     fused render (one dispatch) vs a TRUE f32 anchor (the unfused XLA path
     under default_matmul_precision('highest'), chunked) — rgb / depth within
     max(1e-3, 3x the production unfused-bf16 path's own noise). This check
     CAUGHT a real defect in round 5: the kernel's f32 composite matmul was
     silently truncating logs to bf16 (Mosaic lowers f32 dots to one bf16
     MXU pass), 1.6e-3 rgb error — fixed by the VPU prefix scan in
     _composite_forward; the fused path now sits at the shared bf16-matmul
     noise (measured 3.9e-4 = exactly the unfused path's own noise).
  2. eval grads (the test-time pose-opt path): d(params)/d(pixels) of a
     mixed output loss at 1024 rays — 5e-3 relative (shared bf16 matmul noise
     dominates; the CPU interpret-mode test uses the same bound).
  3. train-fused single-kernel loss (render_ray_loss_fused via _ray_terms) at
     the bench workload 1024 rays x 128 samples: total + per-term metrics to
     2e-5, all grads to 5e-5 (max-normalized).

Reference workload: /root/reference/model/eval_images.py:78-92 (eval frame),
model/training.py:70-100 (train step). Record the output in docs/PERF.md after
kernel changes. Exit code 0 = parity holds.

Usage: python scripts/check_kernel_parity.py [--small]   (--small: 8-ray smoke)
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.flatten_util
import jax.numpy as jnp

from nope_nerf_tpu.geometry.camera import camera_matrix_from_focal, pixel_grid
from nope_nerf_tpu.models.nerf import NerfConfig, init_nerf_params
from nope_nerf_tpu.ops.render import RenderConfig, render_nope_nerf

H, W, S = 188, 621, 128
FAILURES = []


def report(name: str, delta: float, tol: float):
    ok = delta <= tol
    print(f"  {'OK  ' if ok else 'FAIL'} {name}: max delta {delta:.2e} "
          f"(tol {tol:.0e})", flush=True)
    if not ok:
        FAILURES.append((name, delta, tol))


def eval_value_parity(params, cam, world, small: bool):
    """Three runs: a TRUE f32 anchor (compute_dtype float32 under
    default_matmul_precision('highest') — on TPU, default-precision 'f32'
    matmuls are ONE bf16 pass, so without the context there is no f32 truth
    on hardware), the production unfused bf16 path, and the fused kernel.

    Tolerance = max(1e-3, 3x the unfused path's own bf16 noise) — in
    practice 3x noise (~1.2e-3) is the binding bound; the fused path
    measures AT the noise (3.9e-4 rgb). Note the round-4 "trig-argument
    association" story for a 1e-3 floor was wrong: scaling by 2^i is exact
    in floating point, so (2^i*o) + (2^i*v)*z and 2^i*(o + v*z) are
    bit-identical — there is no association budget, and the 1.6e-3 this
    check originally measured was a genuine kernel defect (bf16-truncating
    Mosaic f32 dot in the composite, fixed round 5). A layout bug (wrong
    lane, dropped term) shows up orders of magnitude above the noise."""
    # H*W rounded DOWN to a ray-tile multiple: render_nope_nerf only takes the
    # fused ray-kernel path when n_rays % 8 == 0 (ops/render.py use_fused);
    # 116748 rays would silently fall back to the POINT kernel, which at
    # full-frame scale materializes (N*S, 64) encodings and OOMs 15.75G HBM.
    n = 16 if small else (H * W) // 8 * 8
    chunk = 16 if small else 16384  # unfused XLA path: bounded HBM footprint
    print(f"[1] eval values, {n} rays x {S} samples (fused one-dispatch vs "
          f"unfused chunked, true-f32 anchor):", flush=True)
    _, pix_all = pixel_grid((H, W))
    pixels = pix_all[:n]
    depth_prior = 1.0 + 4.0 * jax.random.uniform(jax.random.key(4), (n, 1))
    rcfg = RenderConfig(num_points=S, depth_range=(0.01, 10.0))

    def run(ncfg, px, dp):
        out = render_nope_nerf(params, px, dp, cam, world, None,
                               jax.random.key(7), rcfg, ncfg, add_noise=False)
        return out["rgb"], out["depth_pred"]

    outs = {}
    for tag, dtype, fused, precision in (
            ("anchor_f32", "float32", False, "highest"),
            ("unfused_bf16", "bfloat16", False, None),
            ("fused", "bfloat16", True, None)):
        ncfg = NerfConfig(compute_dtype=dtype, use_pallas=fused)
        f = jax.jit(lambda px, dp, ncfg=ncfg: run(ncfg, px, dp))
        t0 = time.perf_counter()
        with jax.default_matmul_precision(precision or "default"):
            if fused:
                got = [jax.device_get(f(pixels, depth_prior))]
            else:
                got = [jax.device_get(f(pixels[i:i + chunk],
                                        depth_prior[i:i + chunk]))
                       for i in range(0, n, chunk)]
        outs[tag] = tuple(np.concatenate([o[j] for o in got])
                          for j in range(2))
        print(f"  {tag}: {time.perf_counter()-t0:.1f}s", flush=True)

    def dmax(a, b, j):
        u = outs[a][j]
        scale = max(1e-3, float(np.max(np.abs(u))))
        return float(np.max(np.abs(outs[b][j] - u))) / scale

    for j, name in enumerate(("rgb", "depth")):
        noise = dmax("anchor_f32", "unfused_bf16", j)
        print(f"       [production unfused-bf16 noise vs f32 anchor: "
              f"{noise:.2e}]", flush=True)
        report(f"eval {name} fused vs f32 anchor",
               dmax("anchor_f32", "fused", j), max(1e-3, 3 * noise))


def eval_grad_parity(params, cam, world, small: bool):
    n = 8 if small else 1024
    print(f"[2] eval grads (pose-opt path), {n} rays:", flush=True)
    _, pix_all = pixel_grid((H, W))
    pixels = pix_all[:n]
    depth_prior = 2.0 + jax.random.uniform(jax.random.key(5), (n, 1))
    rcfg = RenderConfig(num_points=S, depth_range=(0.01, 10.0))

    def loss_fn(p, px, ncfg):
        out = render_nope_nerf(p, px, depth_prior, cam, world, None,
                               jax.random.key(3), rcfg, ncfg, add_noise=True)
        return (jnp.sum(out["rgb"] ** 2) + jnp.sum(out["depth_pred"] ** 2)
                + jnp.sum(out["weights"][:, ::7] ** 2)
                + jnp.sum(out["alpha"][:, 5]))

    grads = {}
    for name, up in (("unfused", False), ("fused", True)):
        ncfg = NerfConfig(compute_dtype="bfloat16", use_pallas=up)
        g = jax.jit(jax.grad(lambda p, px: loss_fn(p, px, ncfg),
                             argnums=(0, 1)))(params, pixels)
        grads[name], _ = jax.flatten_util.ravel_pytree(jax.device_get(g))
    r, f = np.asarray(grads["unfused"]), np.asarray(grads["fused"])
    report("eval param+pixel grads (rel)",
           float(np.max(np.abs(r - f))) / (float(np.max(np.abs(r))) + 1e-9),
           5e-3)


def train_parity(small: bool):
    import nope_nerf_tpu.ops.render as R
    from nope_nerf_tpu.losses import LossConfig
    from nope_nerf_tpu.training.trainer import _ray_terms

    n = 8 if small else 1024
    print(f"[3] train-fused loss kernel, {n} rays x {S} samples:", flush=True)
    key = jax.random.key(2)
    ncfg = NerfConfig(compute_dtype="bfloat16", use_pallas=True)
    params = init_nerf_params(key, ncfg)
    rcfg = RenderConfig(num_points=S, depth_range=(0.01, 10.0))
    cam = camera_matrix_from_focal(jnp.asarray(1.2), jnp.asarray(1.4))
    world = jnp.eye(4)
    _, pix_all = pixel_grid((H, W))
    pixels = pix_all[:n]
    kd, kr = jax.random.split(jax.random.key(5))
    depth_prior = 2.0 + jax.random.uniform(kd, (n, 1))
    rgb_gt = jax.random.uniform(kr, (n, 3))
    prior_mask = (jnp.arange(n) % 3) != 0

    class MC:
        pass

    mc = MC()
    mc.nerf, mc.render = ncfg, rcfg
    mc.detach_gt_depth = False
    mc.stratified_noise = True
    mc.loss = LossConfig()
    weights = {"rgb_weight": jnp.asarray(0.7), "depth_weight": jnp.asarray(0.3)}

    def total_of(disable):
        orig = R.fused_train_eligible
        if disable:
            R.fused_train_eligible = lambda *a: False
        try:
            def f(p):
                l_rgb, l_depth, l2, tot = _ray_terms(
                    p, pixels, depth_prior, rgb_gt, prior_mask, cam, world,
                    None, jax.random.key(9), mc, "l1", n, weights=weights)
                if tot is None:
                    tot = (weights["rgb_weight"] * l_rgb
                           + weights["depth_weight"] * l_depth)
                return tot, (l_rgb, l_depth, l2)
            (tot, mets), grads = jax.jit(
                jax.value_and_grad(f, has_aux=True))(params)
        finally:
            R.fused_train_eligible = orig
        return (float(tot), [float(m) for m in mets],
                jax.flatten_util.ravel_pytree(jax.device_get(grads))[0])

    t_r, m_r, g_r = total_of(True)
    t_f, m_f, g_f = total_of(False)
    report("train total loss (rel)", abs(t_f - t_r) / max(abs(t_r), 1e-9), 2e-5)
    for name, a, b in zip(("l_rgb", "l_depth", "l2"), m_r, m_f):
        report(f"train metric {name} (rel)", abs(b - a) / max(abs(a), 1e-9),
               2e-5)
    scale = float(np.max(np.abs(np.asarray(g_r)))) + 1e-12
    report("train grads (max-normalized)",
           float(np.max(np.abs(np.asarray(g_f) - np.asarray(g_r)))) / scale,
           5e-5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="8-ray smoke test")
    args = ap.parse_args()

    # persistent compile cache — same as bench.py
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    key = jax.random.key(0)
    params = init_nerf_params(key, NerfConfig())
    cam = camera_matrix_from_focal(jnp.asarray(1.2), jnp.asarray(1.4))
    world = jnp.eye(4)

    eval_value_parity(params, cam, world, args.small)
    eval_grad_parity(params, cam, world, args.small)
    train_parity(args.small)

    if FAILURES:
        print(f"\nPARITY FAILURES ({len(FAILURES)}):")
        for name, delta, tol in FAILURES:
            print(f"  {name}: {delta:.2e} > {tol:.0e}")
        sys.exit(1)
    print("\nall kernel parity checks passed on "
          f"{jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
