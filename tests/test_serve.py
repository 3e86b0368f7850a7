"""Serving layer: dynamic micro-batching core + HTTP front end.

Machinery tests run against a plain numpy scorer (no device) so they pin
the batching/backpressure/teardown semantics; one integration test runs
the real mel -> CNN-BiLSTM scorer through HTTP end to end.
"""

import base64
import json
import os
import tempfile
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from audioanalysisdetector_tpu.serve import (
    BatchingScorer,
    ScoreServer,
    ServiceOverloaded,
)

N = 64  # row length for machinery tests


def _sum_scorer():
    calls = []

    def scorer(batch):
        calls.append(batch.shape)
        return batch.sum(axis=1)

    return scorer, calls


def test_batcher_aggregates_concurrent_requests():
    scorer, calls = _sum_scorer()
    b = BatchingScorer(scorer, n_samples=N, max_batch=8, max_wait_ms=100.0)
    try:
        rng = np.random.default_rng(0)
        rows = rng.standard_normal((8, N)).astype(np.float32)
        results = [None] * 8
        barrier = threading.Barrier(8)

        def post(i):
            barrier.wait()
            results[i] = b.score(rows[i])

        threads = [threading.Thread(target=post, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(8):
            np.testing.assert_allclose(results[i], rows[i].sum()[None], rtol=1e-5)
        # 8 simultaneous single-row requests inside a 100 ms window must
        # coalesce into far fewer device dispatches than requests
        assert len(calls) < 8, calls
        assert all(shape == (8, N) for shape in calls)  # one compiled shape
        snap = b.stats.snapshot()
        assert snap["requests"] == 8 and snap["utterances"] == 8
        assert snap["batches"] == len(calls)
    finally:
        b.close()


def test_batcher_splits_oversize_request():
    scorer, calls = _sum_scorer()
    b = BatchingScorer(scorer, n_samples=N, max_batch=8, max_wait_ms=1.0)
    try:
        rows = np.arange(20 * N, dtype=np.float32).reshape(20, N)
        out = b.score(rows)
        np.testing.assert_allclose(out, rows.sum(axis=1), rtol=1e-5)
        assert all(shape == (8, N) for shape in calls)
        assert len(calls) >= 3  # 20 rows over an 8-row budget
    finally:
        b.close()


def test_batcher_error_propagates_and_service_survives():
    state = {"fail": True}

    def scorer(batch):
        if state["fail"]:
            state["fail"] = False
            raise RuntimeError("injected device fault")
        return batch.sum(axis=1)

    b = BatchingScorer(scorer, n_samples=N, max_batch=4, max_wait_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="injected device fault"):
            b.score(np.ones((1, N), np.float32))
        out = b.score(np.full((1, N), 2.0, np.float32))  # next request is fine
        np.testing.assert_allclose(out, [2.0 * N])
        assert b.stats.snapshot()["errors"] == 1
    finally:
        b.close()


def test_batcher_close_stops_worker_and_refuses_new_work():
    scorer, _ = _sum_scorer()
    b = BatchingScorer(scorer, n_samples=N, max_batch=4, max_wait_ms=1.0)
    b.score(np.ones((2, N), np.float32))
    b.close()
    assert not b._worker.is_alive()
    with pytest.raises(RuntimeError, match="closed"):
        b.score(np.ones((1, N), np.float32))


def test_batcher_rejected_request_cancels_queued_slices():
    """A multi-slice request that hits a full queue mid-enqueue must not
    leave orphan slices for the worker to score (wasted dispatches at
    exactly the moment the chip is saturated)."""
    scorer, calls = _sum_scorer()
    b = BatchingScorer(
        scorer, n_samples=N, max_batch=4, max_wait_ms=1.0, queue_depth=2
    )
    # wedge the worker: occupy it with a slow item so the queue stays full
    gate = threading.Event()
    slow_scorer_hit = threading.Event()
    orig = b._scorer

    def slow(batch):
        slow_scorer_hit.set()
        gate.wait(5.0)
        return orig(batch)

    b._scorer = slow
    t = threading.Thread(target=lambda: b.score(np.ones((1, N), np.float32)))
    t.start()
    assert slow_scorer_hit.wait(5.0)
    # while the worker is wedged: one 4-row request sits in the queue, then
    # a 12-row request (3 slices) overflows depth 2 on its second slice
    filler = threading.Thread(target=lambda: b.score(np.ones((4, N), np.float32)))
    filler.start()
    time.sleep(0.1)
    with pytest.raises(ServiceOverloaded):
        b.score(np.ones((12, N), np.float32))
    gate.set()
    t.join(5.0)
    filler.join(5.0)
    b.close()
    # every dispatched row belongs to the wedge/filler (1 + 4); the rejected
    # request's already-queued slice was discarded, not scored
    assert b.stats.batch_rows == 5
    assert b.stats.rejected == 1


def test_batcher_timed_out_request_cancels_queued_slices():
    """A request that exceeds its timeout must cancel its still-queued
    slices — the worker would otherwise dispatch full device batches whose
    results nobody reads, on a chip that is already saturated."""
    scorer, _calls = _sum_scorer()
    b = BatchingScorer(
        scorer, n_samples=N, max_batch=4, max_wait_ms=1.0, queue_depth=8
    )
    gate = threading.Event()
    wedged = threading.Event()
    orig = b._scorer

    def slow(batch):
        wedged.set()
        gate.wait(5.0)
        return orig(batch)

    b._scorer = slow
    t = threading.Thread(target=lambda: b.score(np.ones((1, N), np.float32)))
    t.start()
    assert wedged.wait(5.0)
    # 3 slices enqueue behind the wedge; the tiny timeout expires first
    with pytest.raises(TimeoutError):
        b.score(np.ones((12, N), np.float32), timeout=0.05)
    gate.set()
    t.join(5.0)
    b.close()
    # only the wedge row was scored; the timed-out request's slices were
    # skipped at pop time
    assert b.stats.batch_rows == 1


def test_batcher_score_after_close_fails_fast_not_timeout():
    """A request that slips past the _stop check while close() runs must be
    failed by the drain, not left hanging until the request timeout."""
    scorer, _ = _sum_scorer()
    b = BatchingScorer(scorer, n_samples=N, max_batch=4, max_wait_ms=1.0)
    b.close()
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="closed"):
        b.score(np.ones((1, N), np.float32), timeout=30.0)
    assert time.monotonic() - t0 < 5.0
    # and even a pending that somehow entered the queue gets failed by drain
    from audioanalysisdetector_tpu.serve.server import _Pending

    p = _Pending(np.ones((1, N), np.float32))
    b._q.put(p)
    b.close()  # idempotent close re-drains
    assert p.done.is_set() and isinstance(p.error, RuntimeError)


@pytest.fixture()
def http_server():
    scorer, calls = _sum_scorer()
    b = BatchingScorer(scorer, n_samples=N, max_batch=8, max_wait_ms=2.0)
    server = ScoreServer(b, sr=16000, host="127.0.0.1", port=0)
    server.start_background()
    yield server, calls
    server.close()
    assert not b._worker.is_alive()


def _post(port, payload, path="/v1/score"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=30
    ) as r:
        return r.status, json.loads(r.read())


def test_http_score_pcm_rows(http_server):
    server, _ = http_server
    rng = np.random.default_rng(1)
    rows = rng.standard_normal((3, N)).astype(np.float32)
    status, out = _post(server.port, {"pcm": rows.tolist()})
    assert status == 200
    np.testing.assert_allclose(out["scores"], rows.sum(axis=1), rtol=1e-5)
    assert out["labels"] == [int(s > 0.5) for s in out["scores"]]
    # short rows are zero-padded, long rows cropped, to the service length
    status, out1 = _post(server.port, {"pcm": rows[0, : N // 2].tolist()})
    assert status == 200
    np.testing.assert_allclose(out1["scores"], rows[0, : N // 2].sum()[None], rtol=1e-5)


def test_http_score_pcm_b64_binary_lane(http_server):
    server, _ = http_server
    rng = np.random.default_rng(4)
    rows = rng.standard_normal((5, N)).astype("<f4")
    payload = {
        "pcm_b64": base64.b64encode(rows.tobytes()).decode(),
        "rows": 5,
    }
    status, out = _post(server.port, payload)
    assert status == 200
    np.testing.assert_allclose(out["scores"], rows.sum(axis=1), rtol=1e-5)
    # row count must divide the buffer
    try:
        _post(server.port, {"pcm_b64": payload["pcm_b64"], "rows": 3})
        raised = None
    except urllib.error.HTTPError as e:
        raised = e.code
    assert raised == 400


def test_http_score_audio_b64(http_server):
    from audioanalysisdetector_tpu.io.audio import load_audio, write_wav

    server, _ = http_server
    rng = np.random.default_rng(2)
    y = (rng.standard_normal(N) * 0.2).astype(np.float32)
    fd, path = tempfile.mkstemp(suffix=".wav")
    os.close(fd)
    try:
        write_wav(path, y, 16000)
        decoded, _ = load_audio(path, sr=16000)  # includes int16 quantization
        with open(path, "rb") as f:
            b64 = base64.b64encode(f.read()).decode()
    finally:
        os.unlink(path)
    status, out = _post(server.port, {"audio_b64": b64, "format": "wav"})
    assert status == 200
    np.testing.assert_allclose(out["scores"], [decoded[:N].sum()], rtol=1e-4)


def test_http_health_stats_and_errors(http_server):
    server, _ = http_server
    status, health = _get(server.port, "/healthz")
    assert status == 200 and health["ok"] is True
    assert health["n_samples"] == N and health["max_batch"] == 8

    _post(server.port, {"pcm": [0.0] * N})
    status, stats = _get(server.port, "/v1/stats")
    assert status == 200 and stats["requests"] >= 1 and stats["batches"] >= 1

    import base64

    pcm_b64 = base64.b64encode(np.zeros(N, np.float32).tobytes()).decode()
    for bad, code in (
        ({"nope": 1}, 400),  # missing pcm/audio_b64
        ({"audio_b64": "!!!notb64", "format": "wav"}, 400),
        ({"audio_b64": "aGk=", "format": "mp3"}, 400),  # unsupported format
        ({"audio_b64": "aGk=", "format": 1}, 400),  # non-string format
        ({"pcm_b64": pcm_b64, "rows": None}, 400),  # null rows
        ({"pcm_b64": pcm_b64, "rows": "2"}, 400),  # string rows
        ({"pcm_b64": ""}, 400),  # empty payload must not score as silence
        ({"pcm": []}, 400),
    ):
        try:
            _post(server.port, bad)
            raised = None
        except urllib.error.HTTPError as e:
            raised = e.code
        assert raised == code, (bad, raised)
    try:
        _get(server.port, "/nope")
        raised = None
    except urllib.error.HTTPError as e:
        raised = e.code
    assert raised == 404


def test_dp_scorer_matches_single_device_and_sets_row_multiple():
    """GSPMD data-parallel serving: same scores, rows sharded over the
    8-virtual-device CPU mesh (conftest), ladder rounded to multiples."""
    import jax

    from audioanalysisdetector_tpu.serve import build_mel_scorer

    n_dev = jax.local_device_count()
    assert n_dev == 8  # conftest contract
    dp, n_samples = build_mel_scorer(sr=8000, seconds=0.25, n_mels=16)
    single, _ = build_mel_scorer(
        sr=8000, seconds=0.25, n_mels=16, data_parallel=False
    )
    assert dp.row_multiple == n_dev and single.row_multiple == 1
    rng = np.random.default_rng(5)
    rows = (rng.standard_normal((16, n_samples)) * 0.1).astype(np.float32)
    np.testing.assert_allclose(dp(rows), single(rows), rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="not divisible"):
        dp(rows[:3])

    # the batcher rounds every bucket up to the scorer's row multiple
    b = BatchingScorer(
        dp,
        n_samples=n_samples,
        max_batch=16,
        max_wait_ms=1.0,
        bucket_sizes=(2, 9, 16),
    )
    try:
        assert b.bucket_sizes == (8, 16)
        out = b.score(rows[:3])  # 3 rows -> dispatched as one 8-row bucket
        padded = np.concatenate([rows[:3], np.zeros((5, n_samples), np.float32)])
        np.testing.assert_allclose(out, single(padded)[:3], rtol=1e-5, atol=1e-6)
    finally:
        b.close()
    with pytest.raises(ValueError, match="row multiple"):
        BatchingScorer(dp, n_samples=n_samples, max_batch=12)


def test_http_real_mel_scorer_end_to_end():
    """The flagship service contract: HTTP scores == direct jitted scores."""
    from audioanalysisdetector_tpu.serve import build_mel_scorer

    scorer, n_samples = build_mel_scorer(
        sr=8000, seconds=0.25, n_mels=16, data_parallel=False
    )
    assert n_samples == 2000
    b = BatchingScorer(scorer, n_samples=n_samples, max_batch=4, max_wait_ms=2.0)
    server = ScoreServer(b, sr=8000, host="127.0.0.1", port=0)
    server.start_background()
    try:
        rng = np.random.default_rng(3)
        rows = (rng.standard_normal((2, n_samples)) * 0.1).astype(np.float32)
        status, out = _post(server.port, {"pcm": rows.tolist()})
        assert status == 200
        direct = scorer(
            np.concatenate([rows, np.zeros((2, n_samples), np.float32)])
        )[:2]
        np.testing.assert_allclose(out["scores"], direct, rtol=1e-4, atol=1e-5)
        assert all(0.0 <= s <= 1.0 for s in out["scores"])
    finally:
        server.close()


def test_adaptive_window_ships_early_at_low_arrival_rate():
    """Adaptive mode: once the EWMA knows arrivals are far apart, a lone
    request ships immediately instead of idling out the full window."""
    scorer, calls = _sum_scorer()
    b = BatchingScorer(
        scorer, n_samples=N, max_batch=8, max_wait_ms=400.0,
        bucket_sizes=(1, 2, 4, 8),
    )
    try:
        rows = np.ones((1, N), np.float32)
        # sequential lone requests: inter-arrival >> any reachable-boundary
        # ETA, so after the estimator warms up the window must not be paid
        b.score(rows)  # no estimate yet -> fixed-window behavior, warms EWMA
        for _ in range(2):
            time.sleep(0.5)  # inter-arrival gap >> window cap
            b.score(rows)
        t0 = time.monotonic()
        out = b.score(rows)
        dt = time.monotonic() - t0
        np.testing.assert_allclose(out, rows.sum(axis=1), rtol=1e-6)
        assert dt < 0.2, f"lone request waited the full window ({dt:.3f}s)"
        assert b.stats.snapshot()["early_ships"] >= 1
        assert all(shape[0] <= 2 for shape in calls)  # pads to tiny buckets
    finally:
        b.close()


def test_adaptive_false_waits_full_window():
    scorer, _ = _sum_scorer()
    b = BatchingScorer(
        scorer, n_samples=N, max_batch=8, max_wait_ms=150.0, adaptive=False
    )
    try:
        rows = np.ones((1, N), np.float32)
        b.score(rows)  # warm (first call also pays the window)
        t0 = time.monotonic()
        b.score(rows)
        dt = time.monotonic() - t0
        assert dt >= 0.14, f"fixed window returned early ({dt:.3f}s)"
        assert b.stats.snapshot()["early_ships"] == 0
    finally:
        b.close()


def test_adaptive_burst_still_coalesces():
    """A synchronized burst must still aggregate under adaptive mode (the
    non-blocking drain + reachable-boundary wait see the queued rows)."""
    scorer, calls = _sum_scorer()
    b = BatchingScorer(
        scorer, n_samples=N, max_batch=8, max_wait_ms=100.0,
        bucket_sizes=(2, 4, 8),
    )
    try:
        rng = np.random.default_rng(1)
        rows = rng.standard_normal((8, N)).astype(np.float32)
        results = [None] * 8
        barrier = threading.Barrier(8)

        def post(i):
            barrier.wait()
            results[i] = b.score(rows[i])

        threads = [threading.Thread(target=post, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(8):
            np.testing.assert_allclose(results[i], rows[i].sum()[None], rtol=1e-5)
        assert len(calls) < 8, calls
    finally:
        b.close()


def _post_raw(port, body: bytes, rows=None):
    headers = {"Content-Type": "application/octet-stream"}
    if rows is not None:
        headers["X-Rows"] = str(rows)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/score_raw",
        data=body, headers=headers, method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_http_score_raw_octet_stream(http_server):
    """/v1/score_raw: raw <f4 rows + X-Rows header — same scores as the
    JSON lanes without base64/JSON parse cost."""
    server, _ = http_server
    rng = np.random.default_rng(7)
    rows = rng.standard_normal((5, N)).astype("<f4")
    status, out = _post_raw(server.port, rows.tobytes(), rows=5)
    assert status == 200
    np.testing.assert_allclose(out["scores"], rows.sum(axis=1), rtol=1e-5)
    assert out["labels"] == [int(s > 0.5) for s in out["scores"]]
    # X-Rows defaults to 1
    status, out1 = _post_raw(server.port, rows[0].tobytes())
    assert status == 200
    np.testing.assert_allclose(out1["scores"], rows[0].sum()[None], rtol=1e-5)


def test_http_score_raw_rejects_malformed(http_server):
    server, _ = http_server
    good = np.zeros((2, N), np.float32).tobytes()
    for body, rows in (
        (good, 3),            # row count doesn't divide the buffer
        (good[:-2], 2),       # not a float32 multiple
        (b"", 1),             # empty payload must not score as silence
        (good, "two"),        # non-integer X-Rows
        (good, 0),            # zero rows
    ):
        try:
            _post_raw(server.port, body, rows=rows)
            code = None
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 400, (rows, len(body))
