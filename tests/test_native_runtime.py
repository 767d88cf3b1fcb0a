"""Native frame-ring runtime: build, push/pop, swizzle, backpressure,
threaded producers."""

import threading

import numpy as np
import pytest

from yolo_deepsort_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ unavailable to build frame_ring"
)


def test_push_pop_swizzle():
    pool = native.FramePool(2, 8, 10, depth=4)
    f0 = np.zeros((8, 10, 3), np.uint8)
    f0[..., 0] = 11  # B
    f0[..., 1] = 22  # G
    f0[..., 2] = 33  # R
    assert pool.push(0, f0)
    batch, valid, n = pool.pop_batch()
    assert n == 1 and valid[0] and not valid[1]
    # BGR -> RGB swizzle applied
    assert batch[0, 0, 0, 0] == 33 and batch[0, 0, 0, 2] == 11
    pool.close()


def test_fifo_order_and_backpressure():
    pool = native.FramePool(1, 4, 4, depth=2)
    for v in (1, 2):
        assert pool.push(0, np.full((4, 4, 3), v, np.uint8))
    # ring full: third push dropped
    assert not pool.push(0, np.full((4, 4, 3), 3, np.uint8))
    assert pool.dropped(0) == 1
    b, v1, _ = pool.pop_batch()
    assert b[0, 0, 0, 0] == 1
    b, v2, _ = pool.pop_batch()
    assert b[0, 0, 0, 0] == 2
    _, v3, n = pool.pop_batch()
    assert n == 0 and not v3[0]
    pool.close()


def test_finished_signalling():
    pool = native.FramePool(1, 4, 4, depth=2)
    pool.push(0, np.zeros((4, 4, 3), np.uint8))
    pool.mark_finished(0)
    assert not pool.finished(0)  # one frame still queued
    pool.pop_batch()
    assert pool.finished(0)
    pool.close()


def test_threaded_producers_batch_gather():
    s, h, w, n_frames = 4, 16, 12, 25
    pool = native.FramePool(s, h, w, depth=8)

    def producer(stream):
        rng = np.random.default_rng(stream)
        for i in range(n_frames):
            frame = np.full((h, w, 3), (stream * 50 + i) % 256, np.uint8)
            while not pool.push(stream, frame):
                pass
        pool.mark_finished(stream)

    threads = [threading.Thread(target=producer, args=(i,)) for i in range(s)]
    for t in threads:
        t.start()

    got = [0] * s
    while not all(pool.finished(i) for i in range(s)):
        batch, valid, n = pool.pop_batch()
        for i in range(s):
            if valid[i]:
                expect = (i * 50 + got[i]) % 256
                assert batch[i, 0, 0, 0] == expect, (i, got[i])
                got[i] += 1
    for t in threads:
        t.join()
    assert got == [n_frames] * s
    # note: dropped() counts REJECTED pushes; the busy-retry producers above
    # legitimately increment it without losing frames
    pool.close()
