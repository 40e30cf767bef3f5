"""Tests for auxiliary pieces: reprojection-loss variants, profiling utils."""

import numpy as np
import jax.numpy as jnp
import pytest

from nope_nerf_tpu.losses import reprojection_loss, dpt_reprojection_loss
from nope_nerf_tpu.utils.profiling import StepTimer, profile_trace


def test_reprojection_loss_auto_mask():
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(6, 8, 3), jnp.float32)
    good_ref = rgb + 0.01          # warped ref matches well
    bad_ref = jnp.asarray(rng.rand(6, 8, 3), jnp.float32)
    ori = jnp.asarray(rng.rand(6, 8, 3), jnp.float32)
    valid = jnp.ones((6, 8, 1), jnp.float32)

    # without auto mask: loss over everything
    l_plain = float(reprojection_loss(rgb, [good_ref], valid, [ori]))
    np.testing.assert_allclose(l_plain, 0.01, rtol=1e-4)
    # auto mask keeps pixels where warp beats the unwarped reference; good_ref
    # always beats a random ori, so the loss is unchanged
    l_auto = float(reprojection_loss(rgb, [good_ref], valid, [ori],
                                     with_auto_mask=True))
    np.testing.assert_allclose(l_auto, l_plain, rtol=1e-4)
    # a bad warp loses to its own ori everywhere -> fully masked -> 0
    l_bad = float(reprojection_loss(rgb, [bad_ref], valid, [bad_ref],
                                    with_auto_mask=True))
    assert l_bad == 0.0


def test_dpt_reprojection_loss_clamps_and_averages():
    rng = np.random.RandomState(1)
    rgb = jnp.asarray(rng.rand(5, 5, 3), jnp.float32)
    refs = [rgb + 2.0, rgb]  # first diff clamps to 1, second is 0
    valid = jnp.ones((5, 5, 1), jnp.float32)
    l = float(dpt_reprojection_loss(rgb, refs, valid, refs))
    np.testing.assert_allclose(l, 0.5, rtol=1e-5)  # (1 + 0) / 2


def test_step_timer():
    t = StepTimer(rays_per_step=1024, window=10)
    import time
    t.tick()
    for _ in range(3):
        time.sleep(0.01)
        t.tick()
    assert 10 < t.steps_per_s < 200
    assert t.rays_per_s == pytest.approx(t.steps_per_s * 1024)
    assert "rays/s" in t.summary()


def test_profile_trace_noop():
    with profile_trace(None):
        pass  # must not raise


def test_summarize_trace(tmp_path):
    """Leaf-attribution over a synthetic chrome trace: wrappers excluded."""
    import gzip
    import json

    from nope_nerf_tpu.utils.profiling import summarize_trace

    trace = {"traceEvents": [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        # wrapper spans [0, 100); two leaves inside; one separate leaf
        {"ph": "X", "pid": 1, "tid": 1, "name": "wrapper", "ts": 0, "dur": 100},
        {"ph": "X", "pid": 1, "tid": 1, "name": "matmul", "ts": 10, "dur": 40},
        {"ph": "X", "pid": 1, "tid": 1, "name": "matmul", "ts": 60, "dur": 30},
        {"ph": "X", "pid": 1, "tid": 1, "name": "copy", "ts": 120, "dur": 10},
        # a non-device process is ignored
        {"ph": "M", "pid": 2, "name": "process_name", "args": {"name": "python"}},
        {"ph": "X", "pid": 2, "tid": 1, "name": "host_junk", "ts": 0, "dur": 999},
    ]}
    d = tmp_path / "plugins" / "profile" / "x"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump(trace, f)

    rows = summarize_trace(str(tmp_path), steps=2)
    table = {name: (ms, cnt) for ms, cnt, name in rows}
    assert "host_junk" not in table
    assert "wrapper" not in table          # it contains other events
    assert table["matmul"] == (0.035, 1.0)  # (40+30)/2 us -> ms
    assert table["copy"] == (0.005, 0.5)


# ---------------------------------------------------------------------------
# bench.py watchdog (the rc=124 tunnel-stall failure mode)
# ---------------------------------------------------------------------------


def _run_bench(extra_env, timeout):
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.update({"NOPE_BENCH_PLATFORM": "cpu", "NOPE_BENCH_TINY": "1"})
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "bench.py")],
        capture_output=True, text=True, timeout=timeout, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][0]
    return json.loads(line)


@pytest.mark.slow
def test_bench_watchdog_emits_json_normally():
    res = _run_bench({}, timeout=300)
    assert res["unit"] == "rays/s"
    assert res["value"] and res["value"] > 0


@pytest.mark.slow
def test_bench_watchdog_survives_injected_stall():
    """A 300 s stall after the first trial must NOT block the JSON line: the
    parent emits from the completed trial at its deadline and kills the child
    (VERDICT round-2 item 5 — the rc=124 failure mode)."""
    res = _run_bench({"NOPE_BENCH_INJECT_STALL_S": "300",
                      "NOPE_BENCH_DEADLINE_S": "5"}, timeout=300)
    assert res["value"] and res["value"] > 0


@pytest.mark.slow
def test_bench_watchdog_retries_stalled_warmup():
    """A first child whose warmup never completes (connection-level tunnel
    stall, observed >520 s on a readback of a trivial program) must be killed
    and replaced by a fresh child at NOPE_BENCH_RETRY_S; the retry child's
    trials must produce a numeric JSON line."""
    res = _run_bench({"NOPE_BENCH_INJECT_PREWARMUP_STALL_S": "600",
                      "NOPE_BENCH_RETRY_S": "3",
                      "NOPE_BENCH_DEADLINE_S": "240",
                      "NOPE_BENCH_LAST_RESORT_S": "280"}, timeout=300)
    assert res["value"] and res["value"] > 0
