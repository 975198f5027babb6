"""Opt-in TPU performance regression floor (VERDICT r4 #3).

The headline RTF was previously guarded only by the round-end `bench.py`
run; a synthesis-path regression would not fail pytest.  This test runs
the SAME supervised benchmark (bench.py in a subprocess — the bench's own
preflight/retry/total-budget machinery applies, and the subprocess keeps
the measurement off this process's cpu-first platform ordering) and
asserts the B=1 bucketed shallow pipeline stays under RTF 0.003 — ~3x
margin over the measured 0.00108 (CLAUDE.md / BENCH artifacts), immune to
the few-percent run-to-run spread on the shared chip.

Opt-in: requires MIXGANTTS_TPU_PERF=1 (the default suite is CPU-only and
must not contend for the single TPU chip; only one TPU process may run at
a time).  Run:  MIXGANTTS_TPU_PERF=1 python -m pytest tests/test_tpu_perf.py -q
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RTF_FLOOR = 0.003


@pytest.mark.tpu
@pytest.mark.skipif(
    not os.environ.get("MIXGANTTS_TPU_PERF"),
    reason="opt-in TPU perf test (set MIXGANTTS_TPU_PERF=1; needs the "
           "real chip, exclusively)")
def test_shallow_synthesis_rtf_floor():
    env = dict(os.environ)
    # the suite must not hang on a degraded tunnel: cap the bench's own
    # total budget below this test's subprocess timeout
    env.setdefault("MIXGANTTS_BENCH_TOTAL", "1200")
    out = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1300)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, (out.stdout, out.stderr[-2000:])
    result = json.loads(lines[-1])
    assert result["value"] is not None, (result, out.stderr[-2000:])
    assert result["value"] < RTF_FLOOR, (
        f"shallow synthesis RTF regressed: {result['value']} >= "
        f"{RTF_FLOOR} (measured 0.00108 at r4/r5)", result)
