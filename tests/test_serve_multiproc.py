"""Multi-process serving: device-owner socket protocol + SO_REUSEPORT workers.

Protocol tests run the owner/client in-process (threads, no spawn) to pin
the framing and error mapping; one end-to-end test spawns the real
process topology (1 owner + 2 HTTP workers sharing a port) and drives it
over HTTP — the mechanism behind ``cli serve --workers N``.
"""

import json
import os
import tempfile
import urllib.error
import urllib.request

import numpy as np
import pytest

from audioanalysisdetector_tpu.serve import (
    BatchingScorer,
    MultiprocessServer,
    ServiceOverloaded,
)
from audioanalysisdetector_tpu.serve.multiproc import DeviceOwner, RemoteScorer

N = 64  # row length for machinery tests


def make_sum_scorer():
    """Spawn-importable factory: scores are row sums (pure numpy)."""

    def scorer(batch):
        return batch.sum(axis=1)

    return scorer, N


def _owner_pair(**batcher_kwargs):
    scorer, n = make_sum_scorer()
    batcher = BatchingScorer(
        scorer, n_samples=n, **{"max_batch": 8, "max_wait_ms": 5.0, **batcher_kwargs}
    )
    sock_path = os.path.join(tempfile.mkdtemp(prefix="aad_mp_test_"), "dev.sock")
    owner = DeviceOwner(sock_path, batcher, platform="cpu")
    owner.start_background()
    return owner, sock_path


def test_remote_scorer_roundtrip_and_contract():
    owner, sock_path = _owner_pair()
    try:
        remote = RemoteScorer(sock_path, connect_timeout=10.0)
        assert remote.n_samples == N and remote.max_batch == 8
        assert remote.platform == "cpu"
        rng = np.random.default_rng(0)
        rows = rng.standard_normal((5, N)).astype(np.float32)
        np.testing.assert_allclose(
            remote.score(rows), rows.sum(axis=1), rtol=1e-5
        )
        # 1-D input promotes to one row, like BatchingScorer.score
        np.testing.assert_allclose(
            remote.score(rows[0]), rows[:1].sum(axis=1), rtol=1e-5
        )
        # stats proxy reads the owner's GLOBAL counters
        snap = remote.stats.snapshot()
        assert snap["utterances"] == 6
        remote.close()
        with pytest.raises(RuntimeError):
            remote.score(rows)
    finally:
        owner.close()


def test_remote_scorer_error_mapping():
    owner, sock_path = _owner_pair()
    try:
        remote = RemoteScorer(sock_path, connect_timeout=10.0)
        with pytest.raises(ValueError):  # wrong row length, client-side
            remote.score(np.zeros((2, N + 1), np.float32))
        # owner-side shutdown surfaces as an internal error frame, and a
        # closed batcher refuses work rather than hanging the socket
        owner.batcher.close()
        with pytest.raises(RuntimeError):
            remote.score(np.zeros((1, N), np.float32))
    finally:
        owner.close()


def test_remote_scorer_overload_maps_to_service_overloaded():
    import threading
    import time as _time

    gate = threading.Event()

    def make_slow():  # block dispatch so the queue can fill
        def scorer(batch):
            gate.wait(5.0)
            return batch.sum(axis=1)

        return scorer, N

    scorer, n = make_slow()
    batcher = BatchingScorer(
        scorer, n_samples=n, max_batch=2, max_wait_ms=1.0, queue_depth=1
    )
    sock_path = os.path.join(tempfile.mkdtemp(prefix="aad_mp_test_"), "dev.sock")
    owner = DeviceOwner(sock_path, batcher, platform="cpu")
    owner.start_background()
    try:
        remote = RemoteScorer(sock_path, connect_timeout=10.0)
        rows = np.zeros((2, N), np.float32)
        t1 = threading.Thread(
            target=lambda: remote.score(rows, timeout=10.0), daemon=True
        )
        t1.start()
        _time.sleep(0.3)  # worker picks up the first batch and blocks
        def flood():  # extra flooders may themselves see the 503 — fine
            try:
                RemoteScorer(sock_path, connect_timeout=5.0).score(
                    rows, timeout=10.0
                )
            except ServiceOverloaded:
                pass

        flooders = [threading.Thread(target=flood, daemon=True) for _ in range(2)]
        for t in flooders:
            t.start()
        _time.sleep(0.3)  # queue (depth 1) now holds a waiter
        with pytest.raises(ServiceOverloaded):
            RemoteScorer(sock_path, connect_timeout=5.0).score(rows, timeout=10.0)
    finally:
        gate.set()
        owner.close()


def test_multiprocess_server_end_to_end():
    """1 spawned device owner + 2 SO_REUSEPORT HTTP workers on one port."""
    srv = MultiprocessServer(
        workers=2,
        sr=16000,
        factory_spec="tests.test_serve_multiproc:make_sum_scorer",
        batcher_kwargs=dict(max_batch=8, max_wait_ms=5.0),
        force_cpu=True,
    )
    try:
        srv.start(ready_timeout=300.0)
        url = f"http://127.0.0.1:{srv.port}"
        h = json.loads(urllib.request.urlopen(url + "/healthz", timeout=30).read())
        assert h["ok"] and h["n_samples"] == N and h["platform"] == "cpu"

        rng = np.random.default_rng(0)
        rows = rng.standard_normal((4, N)).astype(np.float32)
        req = urllib.request.Request(
            url + "/v1/score_raw",
            data=rows.tobytes(),
            headers={
                "Content-Type": "application/octet-stream",
                "X-Rows": "4",
            },
        )
        out = json.loads(urllib.request.urlopen(req, timeout=60).read())
        np.testing.assert_allclose(out["scores"], rows.sum(axis=1), rtol=1e-5)

        # each request opens a fresh connection, so the kernel spreads them
        # over the reuseport group; stats must still aggregate globally
        for i in range(6):
            req = urllib.request.Request(
                url + "/v1/score",
                data=json.dumps({"pcm": rows[i % 4].tolist()}).encode(),
                headers={"Content-Type": "application/json"},
            )
            json.loads(urllib.request.urlopen(req, timeout=60).read())
        stats = json.loads(urllib.request.urlopen(url + "/v1/stats", timeout=30).read())
        assert stats["utterances"] == 10  # 4 + 6 across both workers

        # malformed request -> 400 from whichever worker catches it
        bad = urllib.request.Request(
            url + "/v1/score_raw",
            data=b"\x00" * 10,  # not a float32 multiple
            headers={"Content-Type": "application/octet-stream"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        srv.close()
