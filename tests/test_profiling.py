"""Profiling subsystem: trace capture writes a TensorBoard profile dir;
throughput meter arithmetic."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from mixgantts_tpu.utils.profiling import StepProfiler, ThroughputMeter, trace


def test_trace_context_writes_profile(tmp_path):
    log_dir = str(tmp_path / "prof")
    with trace(log_dir):
        x = jnp.ones((64, 64))
        jax.block_until_ready(x @ x)
    assert glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                     recursive=True)


def test_step_profiler_window(tmp_path):
    log_dir = str(tmp_path / "prof")
    prof = StepProfiler(log_dir, start_step=3, n_steps=2)
    for step in range(1, 7):
        prof.step(step)
        jax.block_until_ready(jnp.ones((8, 8)) * step)
    prof.close()
    assert glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                     recursive=True)


def test_step_profiler_noop_without_dir():
    prof = StepProfiler(None, start_step=0)
    for step in range(3):
        prof.step(step)
    prof.close()


def test_throughput_meter():
    m = ThroughputMeter()
    m.update(np.array([10, 20]))
    m.update(np.array([5, 5]))
    it_s, frames_s = m.read_and_reset()
    assert it_s > 0 and frames_s > 0
    assert abs(frames_s / it_s - 20.0) < 1e-6  # 40 frames / 2 steps
