"""Prefetch wrapper: order, None passthrough, exception propagation."""

import pytest

from mixgantts_tpu.data.prefetch import prefetch


def test_prefetch_preserves_order_and_nones():
    src = [1, 2, None, 3, None, 4]
    assert list(prefetch(iter(src), size=2)) == src


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), size=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_infinite_iterator():
    def counter():
        i = 0
        while True:
            yield i
            i += 1

    it = prefetch(counter(), size=4)
    assert [next(it) for _ in range(10)] == list(range(10))
