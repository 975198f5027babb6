"""Unit tests for the chunk-dispatch scheduler (`cli/train.py::
schedule_segments`): shape-keyed buffering, strict arrival order,
periodic-boundary and total_step caps, epoch flushes.

Uses opaque fake batches with an explicit key_fn, so ordering semantics
are pinned deterministically (no corpus/seed dependence)."""

from mixgantts_tpu.cli.train import schedule_segments

BIG = [1000, 1000, 1000, 1000]  # no periodic boundary interference


def run(stream, k, strict=False, first_step=1, total_step=100,
        periods=BIG):
    events = list(schedule_segments(
        iter(stream), k, first_step, total_step, periods, strict=strict,
        key_fn=lambda b: b[0]))
    segs = [payload for ev, payload in events if ev == "run"]
    return events, segs


def test_plain_mode_groups_by_shape_and_reorders():
    """[B, A, A] with k=2: the A pair fills first and dispatches ahead of
    B (the documented plain-mode reordering); every batch runs once."""
    stream = [("B", 0), ("A", 1), ("A", 2), None]
    events, segs = run(stream, k=2)
    assert segs[0] == [("A", 1), ("A", 2)]  # scan of 2, ahead of B
    assert segs[1] == [("B", 0)]            # epoch flush
    assert events[-1] == ("epoch", None)


def test_strict_mode_preserves_arrival_order():
    """Same stream, strict=True: flush-on-shape-change keeps the exact
    reference order at every step (shorter scans instead)."""
    stream = [("B", 0), ("A", 1), ("A", 2), None]
    _, segs = run(stream, k=2, strict=True)
    flat = [b for seg in segs for b in seg]
    assert flat == [("B", 0), ("A", 1), ("A", 2)]
    assert segs[0] == [("B", 0)]            # flushed when A arrived
    assert segs[1] == [("A", 1), ("A", 2)]  # same-shape run still scans


def test_strict_mode_scans_within_same_shape_runs():
    stream = [("A", i) for i in range(4)] + [("B", 4), ("B", 5), None]
    _, segs = run(stream, k=4, strict=True)
    assert segs[0] == [("A", 0), ("A", 1), ("A", 2), ("A", 3)]
    assert segs[1] == [("B", 4), ("B", 5)]


def test_segments_never_cross_periodic_boundaries():
    """save/log/val/synth steps must observe the state at exactly the
    reference step, so a chunk is split at every period multiple."""
    stream = [("A", i) for i in range(6)] + [None]
    _, segs = run(stream, k=4, periods=[3, 1000, 1000, 1000])
    lens = [len(s) for s in segs]
    # steps 1..6 with a boundary after every 3rd step: 3+3, never 4
    assert lens == [3, 3]
    # k=4 with boundary at multiples of 2
    _, segs = run(stream, k=4, periods=[2, 1000, 1000, 1000])
    assert [len(s) for s in segs] == [2, 2, 2]


def test_total_step_caps_the_stream():
    stream = [("A", i) for i in range(10)] + [None]
    _, segs = run(stream, k=4, total_step=5)
    flat = [b for seg in segs for b in seg]
    assert len(flat) == 5
    assert [len(s) for s in segs] == [4, 1]


def test_epoch_flushes_partial_buffers_and_marks_epoch():
    stream = [("A", 0), ("B", 1), None, ("A", 2), ("A", 3), None]
    events, segs = run(stream, k=2)
    # epoch 1: both singletons flush (insertion order), then the marker
    assert segs[0] == [("A", 0)]
    assert segs[1] == [("B", 1)]
    assert events[2] == ("epoch", None)
    # epoch 2: the A pair scans
    assert segs[2] == [("A", 2), ("A", 3)]
    assert events[-1] == ("epoch", None)


def test_k1_is_pure_passthrough_in_both_modes():
    stream = [("B", 0), ("A", 1), ("B", 2), None]
    for strict in (False, True):
        _, segs = run(stream, k=1, strict=strict)
        assert [b for seg in segs for b in seg] == stream[:3]
        assert all(len(s) == 1 for s in segs)


def test_finite_stream_without_epoch_marker_flushes_tail():
    """A plain batch list (no trailing None) must not silently drop the
    partial buffers at end of stream."""
    stream = [("A", 0), ("A", 1), ("B", 2)]
    _, segs = run(stream, k=4)
    flat = [b for seg in segs for b in seg]
    assert sorted(x[1] for x in flat) == [0, 1, 2]
