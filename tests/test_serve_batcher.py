"""Unit tests for tools/serve.py's cross-request dynamic batcher
(_MicroBatcher) — pure threading/queueing logic, no device, fast tier.
The end-to-end HTTP path (real model, concurrent clients) is covered by
tests/test_tools_distill_e2e.py::test_serve_distilled_model_concurrent_load."""

import threading
import time

import numpy as np
import pytest

from tools.serve import _MicroBatcher, _bucket


def _mk_run(record, latency_s=0.0):
    def run(hints, steps):
        if latency_s:
            time.sleep(latency_s)
        record.append((hints.shape[0], steps))
        # identifiable output: first pixel value survives the round trip
        return hints + 1000.0, 1.23
    return run


def test_batcher_single_request_passthrough():
    record = []
    b = _MicroBatcher(_mk_run(record), max_batch=4, window_ms=0.0)
    try:
        hints = np.full((1, 2, 2, 3), 7.0, np.float32)
        samples, latency_ms, rows = b.submit(hints, 1)
        assert samples.shape == (1, 2, 2, 3)
        assert float(samples[0, 0, 0, 0]) == 1007.0
        assert rows == 1 and latency_ms == 1.23
        assert record == [(1, 1)]
    finally:
        b.stop()


def test_batcher_coalesces_concurrent_requests():
    """Requests arriving while the device is busy join the next dispatch:
    with a slow first call, 4 trailing submissions coalesce into one
    device call of 4 rows, each getting its own slice back."""
    record = []
    b = _MicroBatcher(_mk_run(record, latency_s=0.15), max_batch=8, window_ms=0.0)
    try:
        results = {}

        def client(i):
            hints = np.full((1, 2, 2, 1), float(i), np.float32)
            results[i] = b.submit(hints, 1)

        t0 = threading.Thread(target=client, args=(0,))
        t0.start()
        time.sleep(0.05)  # dispatcher is now inside the slow run(0)
        rest = [threading.Thread(target=client, args=(i,)) for i in (1, 2, 3, 4)]
        for t in rest:
            t.start()
        t0.join()
        for t in rest:
            t.join()

        sizes = [n for n, _ in record]
        assert sizes[0] == 1
        assert sum(sizes) == 5
        assert max(sizes[1:]) == 4  # the trailing four shared one dispatch
        for i in range(5):
            samples, _, rows = results[i]
            assert float(samples[0, 0, 0, 0]) == 1000.0 + i  # correct slice
        assert results[1][2] == 4  # reported batch rows
    finally:
        b.stop()


def test_batcher_window_merges_burst_on_idle_device():
    record = []
    b = _MicroBatcher(_mk_run(record), max_batch=8, window_ms=250.0)
    try:
        results = []
        lock = threading.Lock()

        def client(i):
            hints = np.full((1, 2, 2, 1), float(i), np.float32)
            out = b.submit(hints, 1)
            with lock:
                results.append(out)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sum(n for n, _ in record) == 3
        assert len(record) <= 2  # burst shared dispatches within the window
    finally:
        b.stop()


def test_batcher_groups_by_steps_and_respects_max_batch():
    """Mixed steps never share a dispatch (jit-static argument), and a
    group never exceeds max_batch rows."""
    record = []
    b = _MicroBatcher(_mk_run(record, latency_s=0.1), max_batch=2, window_ms=0.0)
    try:
        outs = {}

        def client(i, steps):
            hints = np.full((1, 2, 2, 1), float(i), np.float32)
            outs[i] = b.submit(hints, steps)

        t0 = threading.Thread(target=client, args=(0, 1))
        t0.start()
        time.sleep(0.04)
        rest = [threading.Thread(target=client, args=(i, s))
                for i, s in ((1, 1), (2, 2), (3, 1), (4, 2))]
        for t in rest:
            t.start()
        for t in [t0] + rest:
            t.join()

        assert sum(n for n, _ in record) == 5
        for n, _ in record:
            assert n <= 2
        for rows, steps in record:
            assert steps in (1, 2)
        # each request got ITS slice back despite the regrouping
        for i in range(5):
            assert float(outs[i][0][0, 0, 0, 0]) == 1000.0 + i
    finally:
        b.stop()


def test_batcher_propagates_errors_to_every_member():
    def boom(hints, steps):
        raise RuntimeError("device on fire")

    b = _MicroBatcher(boom, max_batch=4, window_ms=0.0)
    try:
        with pytest.raises(RuntimeError, match="device on fire"):
            b.submit(np.zeros((1, 2, 2, 1), np.float32), 1)
        # the dispatcher survives and serves the next request
        b._run = _mk_run([])
        samples, _, _ = b.submit(np.zeros((1, 2, 2, 1), np.float32), 1)
        assert samples.shape == (1, 2, 2, 1)
    finally:
        b.stop()


def test_bucket_helper_unchanged():
    assert _bucket(1, 16) == 1
    assert _bucket(3, 16) == 4
    assert _bucket(9, 12) == 12  # cap exact, not next pow2
