"""device_feed: delivery order, early-abandon shutdown, error propagation.

Covers the round-3 shutdown fix (ADVICE #4): a consumer that breaks out of
the loop must release the worker thread instead of leaving it blocked on
q.put with staged device batches pinned.
"""

import threading
import time
from types import SimpleNamespace

import numpy as np
import pytest

from vitax.data.device_feed import device_feed


def _batch(i, n=2):
    return SimpleNamespace(
        images=np.full((n, 4, 4, 3), i, np.float32),
        labels=np.full((n,), i, np.int32),
        weight=np.float32(1.0),
    )


def _feed_threads():
    return [t for t in threading.enumerate()
            if t.name == "vitax-device-feed" and t.is_alive()]


@pytest.mark.parametrize("depth", [0, 2])
def test_yields_all_batches_in_order(depth):
    got = [(int(np.asarray(img)[0, 0, 0, 0]), int(np.asarray(lab)[0]))
           for img, lab, _ in device_feed([_batch(i) for i in range(5)],
                                          depth=depth)]
    assert got == [(i, i) for i in range(5)]


def test_early_break_releases_worker():
    produced = []

    def loader():
        for i in range(100):
            produced.append(i)
            yield _batch(i)

    feed = device_feed(loader(), depth=2)
    next(feed)
    feed.close()  # consumer abandons the generator (break / exception)
    deadline = time.time() + 5.0
    while _feed_threads() and time.time() < deadline:
        time.sleep(0.05)
    assert not _feed_threads(), "worker thread still alive after close()"
    # the worker must stop staging ahead, not walk the whole loader
    assert len(produced) < 100


def test_loader_error_propagates():
    def loader():
        yield _batch(0)
        raise RuntimeError("decode failed")

    feed = device_feed(loader(), depth=2)
    next(feed)
    with pytest.raises(RuntimeError, match="decode failed"):
        for _ in feed:
            pass
