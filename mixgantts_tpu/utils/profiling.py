"""Profiling & tracing.

The reference has no profiling story beyond tqdm bars (`train.py:87-92`);
the TPU-native replacement is the XLA profiler: `jax.profiler` traces
(viewable in TensorBoard's profile plugin / Perfetto) plus lightweight
step-time and mel-frames/sec counters in the training loop.

Usage from the train CLI:
    --profile_dir DIR    capture a device trace of a few steady-state steps
    --profile_port N     start the live profiler server (connect with
                         TensorBoard's capture button)
"""

import contextlib
import time

import jax
import numpy as np


def start_server(port):
    """Live profiler server for on-demand capture from TensorBoard."""
    return jax.profiler.start_server(int(port))


@contextlib.contextmanager
def trace(log_dir):
    """Capture a device trace into `log_dir` (TensorBoard profile format)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """Decides which steps fall inside the capture window and wraps them in
    a trace; no-op when `log_dir` is None."""

    def __init__(self, log_dir, start_step, n_steps=5):
        self.log_dir = log_dir
        self.start = start_step
        self.stop = start_step + n_steps
        self._active = False
        self._done = False

    def step(self, step):
        if self.log_dir is None or self._done:
            return
        # >= comparisons: with k-step chunked dispatch the observed step
        # values advance in jumps and may never equal start/stop exactly —
        # a segment can even jump clean over [start, stop), so the start
        # condition is plain `step >= start` (the trace then covers the
        # next segment instead of silently never starting)
        if step >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            print(f"profiler: trace written to {self.log_dir}")
        elif step >= self.start and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            print(f"profiler: tracing steps >= {step} -> {self.log_dir}")

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class ThroughputMeter:
    """it/s and mel-frames/s between log points (the reference prints only
    it/s, `train.py:189-199`; frames/s is the BASELINE.md tracked metric)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._steps = 0
        self._frames = 0

    def update(self, mel_lens):
        self._steps += 1
        self._frames += int(np.sum(np.asarray(mel_lens)))

    def read_and_reset(self):
        dt = max(time.time() - self._t0, 1e-9)
        out = (self._steps / dt, self._frames / dt)
        self.reset()
        return out
