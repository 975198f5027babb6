"""Training-path anomaly guards.

SURVEY.md §5 (sanitizer row): the reference has no NaN detection at all —
a diverged GAN run silently burns its full step budget and the failure is
only visible by eyeballing TensorBoard curves afterwards
(`/root/reference/train.py:186-200` logs whatever comes back).  Here the
train CLI asserts every logged metric is finite and fails loudly with the
offending step/keys, and `debug_nans()` wraps a run in jax's
per-primitive NaN checker (`--debug_nans` flag; also used by the CI
stability test).
"""

import contextlib

import jax
import numpy as np


def check_finite_metrics(metrics, step):
    """Raise FloatingPointError if any metric is NaN/Inf.

    `metrics` is the host-side dict of scalar losses a train/eval step
    returned (after `jax.device_get`).  Called at every log step — cheap
    (a dozen scalars) and catches divergence within one log period
    instead of never.
    """
    bad = {}
    for k, v in metrics.items():
        arr = np.asarray(v)
        if np.issubdtype(arr.dtype, np.floating) and not np.all(
                np.isfinite(arr)):
            bad[k] = float(arr) if arr.ndim == 0 else arr
    if bad:
        raise FloatingPointError(
            f"non-finite training metrics at step {step}: "
            + ", ".join(f"{k}={v}" for k, v in sorted(bad.items()))
            + " — the run has diverged or hit a numerical bug; "
            "re-run with --debug_nans to locate the producing primitive")


@contextlib.contextmanager
def debug_nans(enable=True):
    """Context manager toggling jax's NaN debugger (jax_debug_nans).

    Under jit this re-runs the offending computation op-by-op to name the
    primitive that produced the first NaN — slow, so it is opt-in via the
    train CLI's --debug_nans flag and the CI stability test rather than
    always-on.
    """
    if not enable:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
