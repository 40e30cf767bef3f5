"""Probe Mosaic (Pallas-TPU) numerics on the live chip — run when upgrading
jax/libtpu or debugging kernel-vs-XLA numeric gaps.

Documents two hardware facts this framework's kernels are designed around
(discovered round 5 via scripts/check_kernel_parity.py):

1. **A Mosaic f32 `jax.lax.dot` is ONE bf16 MXU pass** — the inputs are
   truncated to 8 significand bits ((1 + 2^-10) @ I returns exactly 1.0).
   `preferred_element_type=jnp.float32` only controls the ACCUMULATOR dtype.
   Consequence: never put f32-precision-critical values (log-transmittance,
   gradients) through an in-kernel matmul; ops/pallas_render.py computes its
   composite prefix/suffix sums as f32 VPU Hillis-Steele scans instead.

2. **Mosaic transcendentals match XLA-on-TPU bitwise** (sin/cos/exp/log/
   sigmoid/softplus share the lowering) and sit at ~1e-7..4e-4 relative of
   CPU f32 depending on the function — accurate enough that the fused kernel
   reaches the unfused path's own bf16-matmul noise floor once the dots are
   handled per (1).

Exit 0 when the probed behavior matches these expectations; exit 1 (with a
report) when an upgrade changed them — in which case revisit the scan-vs-dot
choice in ops/pallas_render.py (a true-f32 Mosaic dot would make the matmul
formulation viable again).
"""
from __future__ import annotations

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

FAILURES = []


def check(name, ok, detail):
    print(f"  {'OK  ' if ok else 'NEW!'} {name}: {detail}")
    if not ok:
        FAILURES.append(name)


def probe_f32_dot():
    def dot_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot(a_ref[:], b_ref[:],
                               preferred_element_type=jnp.float32)

    n = 128
    eps = np.float32(2.0 ** -10)
    a = np.full((8, n), 1.0 + eps, np.float32)
    b = np.eye(n, dtype=np.float32)
    f = jax.jit(pl.pallas_call(
        dot_kernel, out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32)))
    out = float(np.asarray(f(a, b))[0, 0])
    truncates = out == 1.0
    check("f32 dot truncates inputs to bf16", truncates,
          f"(1+2^-10) @ I -> {out!r} "
          f"({'bf16 single pass, as designed around' if truncates else 'FULL f32 — Mosaic upgraded; the matmul composite is viable again'})")


def probe_transcendentals():
    def ew_kernel(op, x_ref, o_ref):
        o_ref[:] = op(x_ref[:])

    cases = {
        "sin": (jnp.sin, np.linspace(-5000, 5000, 1024), 1e-6),
        "exp": (jnp.exp, np.linspace(-14, 0, 1024), 1e-5),
        "sigmoid": (jax.nn.sigmoid, np.linspace(-10, 10, 1024), 1e-5),
        "log": (jnp.log, np.linspace(1e-6, 1.0, 1024), 1e-3),
        "softplus": (jax.nn.softplus, np.linspace(-10, 10, 1024), 1e-3),
    }
    cpu = jax.devices("cpu")[0]
    for name, (op, xs, tol) in cases.items():
        x = xs.astype(np.float32).reshape(8, 128)
        f = jax.jit(pl.pallas_call(
            functools.partial(ew_kernel, op),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32)))
        got_mosaic = np.asarray(f(x))
        got_xla = np.asarray(jax.jit(op)(jnp.asarray(x)))
        with jax.default_device(cpu):
            truth = np.asarray(jax.jit(op)(jax.device_put(jnp.asarray(x),
                                                          cpu)))
        rel = float(np.max(np.abs(got_mosaic - truth)
                           / np.maximum(np.abs(truth), 1e-30)))
        same_as_xla = bool(np.array_equal(got_mosaic, got_xla))
        check(f"{name} accuracy", rel < tol and same_as_xla,
              f"mosaic-vs-cpu rel {rel:.2e} (tol {tol:.0e}), "
              f"bitwise-equal to XLA-on-TPU: {same_as_xla}")


def main():
    print(f"platform: {jax.devices()[0].platform}")
    probe_f32_dot()
    probe_transcendentals()
    if FAILURES:
        print(f"\nBEHAVIOR CHANGED since round 5: {FAILURES} — revisit "
              "ops/pallas_render.py's scan-vs-dot choices")
        sys.exit(1)
    print("\nall Mosaic numerics expectations hold")


if __name__ == "__main__":
    main()
