"""Background-thread batch prefetching.

The training loop's host work (numpy collation, padding, bucket lookup in
`AcousticDataset.batches`) otherwise serializes with device compute: the
next batch is only built after the previous step is dispatched.  A small
bounded queue filled by a daemon thread overlaps the two — the TPU never
waits on the host for data.  Epoch-boundary `None` sentinels pass through
in order.
"""

import queue
import threading

_END = object()


def prefetch(iterator, size=2):
    """Wrap `iterator` so items are produced ahead of time on a daemon
    thread; preserves order, propagates exceptions, forwards None."""
    q = queue.Queue(maxsize=size)

    def fill():
        try:
            for item in iterator:
                q.put((None, item))
        except BaseException as e:  # surfaced on the consumer side
            q.put((e, None))
        q.put((None, _END))

    t = threading.Thread(target=fill, daemon=True)
    t.start()

    while True:
        err, item = q.get()
        if err is not None:
            raise err
        if item is _END:
            return
        yield item
