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


class _GatedRun:
    """run_fn whose first call blocks until the test releases it —
    deterministic way to pile requests up behind a 'busy device' (no
    wall-clock sleeps; this suite runs on a contended 1-core host)."""

    def __init__(self, record):
        self.record = record
        self.entered = threading.Event()  # dispatcher is inside a run call
        self.gate = threading.Event()     # test releases the first call

    def __call__(self, hints, steps):
        self.entered.set()
        self.gate.wait(10)
        self.record.append((hints.shape[0], steps))
        return hints + 1000.0, 1.23


def _wait_queued(b, n, timeout=10.0):
    deadline = time.monotonic() + timeout
    while b._queue.qsize() < n:
        assert time.monotonic() < deadline, "requests never reached the queue"
        time.sleep(0.005)


def test_batcher_coalesces_concurrent_requests():
    """Requests arriving while the device is busy join the next dispatch:
    with the first call gated, 4 trailing submissions coalesce into one
    device call of 4 rows, each getting its own slice back."""
    record = []
    run = _GatedRun(record)
    b = _MicroBatcher(run, max_batch=8, window_ms=0.0)
    try:
        results = {}

        def client(i):
            hints = np.full((1, 2, 2, 1), float(i), np.float32)
            results[i] = b.submit(hints, 1)

        t0 = threading.Thread(target=client, args=(0,))
        t0.start()
        assert run.entered.wait(10)  # dispatcher is inside run(0)
        rest = [threading.Thread(target=client, args=(i,)) for i in (1, 2, 3, 4)]
        for t in rest:
            t.start()
        _wait_queued(b, 4)  # all four parked behind the busy device
        run.gate.set()
        t0.join()
        for t in rest:
            t.join()

        sizes = [n for n, _ in record]
        assert sizes == [1, 4]  # the trailing four shared one dispatch
        for i in range(5):
            samples, _, rows = results[i]
            assert float(samples[0, 0, 0, 0]) == 1000.0 + i  # correct slice
        assert results[1][2] == 4  # reported batch rows
    finally:
        b.stop()


def test_batcher_window_merges_burst_on_idle_device():
    """A burst hitting an idle device shares a dispatch via the arrival
    window.  The window is generous (5 s) so the only timing assumption is
    that three already-started threads enqueue within it; max_batch == the
    burst size means the batch dispatches the moment it fills (no window
    sleep on the happy path)."""
    record = []
    b = _MicroBatcher(_mk_run(record), max_batch=3, window_ms=5000.0)
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
    run = _GatedRun(record)
    b = _MicroBatcher(run, max_batch=2, window_ms=0.0)
    try:
        outs = {}

        def client(i, steps):
            hints = np.full((1, 2, 2, 1), float(i), np.float32)
            outs[i] = b.submit(hints, steps)

        t0 = threading.Thread(target=client, args=(0, 1))
        t0.start()
        assert run.entered.wait(10)
        rest = [threading.Thread(target=client, args=(i, s))
                for i, s in ((1, 1), (2, 2), (3, 1), (4, 2))]
        for t in rest:
            t.start()
        _wait_queued(b, 4)
        run.gate.set()
        for t in [t0] + rest:
            t.join()

        # head (steps=1) alone, then {1,3} (steps=1), then {2,4} (steps=2)
        assert record == [(1, 1), (2, 1), (2, 2)]
        # each request got ITS slice back despite the regrouping
        for i in range(5):
            assert float(outs[i][0][0, 0, 0, 0]) == 1000.0 + i
    finally:
        b.stop()


def test_batcher_sheds_cancelled_requests():
    """A request whose submit() timed out is dropped by the dispatcher
    instead of burning a device call on a result nobody reads."""
    record = []
    run = _GatedRun(record)
    b = _MicroBatcher(run, max_batch=4, window_ms=0.0)
    try:
        t0 = threading.Thread(
            target=lambda: b.submit(np.zeros((1, 2, 2, 1), np.float32), 1))
        t0.start()
        assert run.entered.wait(10)  # device "busy" with request 0

        with pytest.raises(TimeoutError):
            # times out while parked behind the gated call -> cancelled
            b.submit(np.full((1, 2, 2, 1), 5.0, np.float32), 1, timeout=0.05)

        run.gate.set()
        t0.join()
        # the live follow-up still works; the cancelled one never dispatched
        out, _, rows = b.submit(np.full((1, 2, 2, 1), 9.0, np.float32), 1)
        assert float(out[0, 0, 0, 0]) == 1009.0
        assert all(n == 1 for n, _ in record)
        assert sum(n for n, _ in record) == 2  # request 0 + follow-up only
    finally:
        b.stop()


def test_batcher_stop_fails_parked_requests_fast():
    """stop() drains the queue and errors parked requests immediately —
    clients must not sit out the full submit timeout on shutdown."""
    record = []
    run = _GatedRun(record)
    b = _MicroBatcher(run, max_batch=2, window_ms=0.0)
    errors = []

    def client(i):
        try:
            b.submit(np.full((1, 2, 2, 1), float(i), np.float32), 1)
        except Exception as e:
            errors.append(e)

    t0 = threading.Thread(target=client, args=(0,))
    t0.start()
    assert run.entered.wait(10)
    parked = [threading.Thread(target=client, args=(i,)) for i in (1, 2, 3)]
    for t in parked:
        t.start()
    _wait_queued(b, 3)

    run.gate.set()  # let the in-flight call finish so _loop can observe _stop
    t_stop = time.monotonic()
    b.stop()
    for t in [t0] + parked:
        t.join(timeout=10)
        assert not t.is_alive()
    assert time.monotonic() - t_stop < 8.0  # nobody waited out the 600 s timeout
    # every parked request that didn't run got a shutdown error
    assert sum(n for n, _ in record) + len(errors) == 4
    assert all("shutting down" in str(e) for e in errors)


def test_batcher_submit_after_stop_fails_fast():
    """A submit landing AFTER stop()'s drain (handler threads keep running
    through server_close under ThreadingHTTPServer) must fail immediately —
    with the dispatcher gone, nothing else would ever complete it, and the
    client would otherwise hang for the full 600 s submit timeout."""
    b = _MicroBatcher(_mk_run([]), max_batch=4, window_ms=0.0)
    b.stop()
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="shutting down"):
        b.submit(np.zeros((1, 2, 2, 1), np.float32), 1)
    assert time.monotonic() - t0 < 5.0

    # the narrower race: the pre-put _stop check passes, stop() drains,
    # THEN the put lands — the post-put re-drain must still fail it fast
    b2 = _MicroBatcher(_mk_run([]), max_batch=4, window_ms=0.0)
    b2._thread.join(timeout=0.0)  # no-op; keep the dispatcher semantics
    orig_put = b2._queue.put

    def put_after_stop(req):
        b2._stop = True
        b2._thread.join(timeout=5.0)
        b2._fail_parked()  # stop()'s drain runs before our put lands
        orig_put(req)

    b2._queue.put = put_after_stop
    b2._stop = False  # the pre-put check must pass to exercise the race
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="shutting down"):
        b2.submit(np.zeros((1, 2, 2, 1), np.float32), 1, timeout=30.0)
    assert time.monotonic() - t0 < 10.0


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
