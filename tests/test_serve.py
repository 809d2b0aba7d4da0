"""Streaming vocoder HTTP server (`pwn_tpu/serve.py`).

Drives the real ThreadingHTTPServer over a socket: health check,
chunked PCM16 synthesis (including that streamed output equals the
deemphasized concatenation of the streaming generator's chunks), the
short-utterance whole-call fallback, and error paths.
"""

import http.client
import io
import threading

import jax
import numpy as np
import pytest
from scipy.io import wavfile

from pwn_tpu.config import get_config, override
from pwn_tpu.models.student import init_student
from pwn_tpu.serve import VocoderService, make_server

CFG = override(get_config("tiny_teacher"), "student.fused_layers", "off")


@pytest.fixture(scope="module")
def server():
    _, variables = init_student(CFG, jax.random.PRNGKey(0))
    service = VocoderService(CFG, variables["params"], chunk_frames=8)
    srv = make_server(service, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, service
    srv.shutdown()


def _wav_body(wav, sr):
    buf = io.BytesIO()
    wavfile.write(buf, sr, (np.clip(wav, -1, 1) * 32767).astype(np.int16))
    return buf.getvalue()


def _post(srv, path, body):
    conn = http.client.HTTPConnection(*srv.server_address, timeout=300)
    conn.request("POST", path, body=body,
                 headers={"Content-Length": str(len(body))})
    return conn, conn.getresponse()


def test_healthz(server):
    srv, service = server
    conn = http.client.HTTPConnection(*srv.server_address, timeout=60)
    conn.request("GET", "/healthz")
    r = conn.getresponse()
    assert r.status == 200
    import json

    body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["sample_rate"] == CFG.dsp.sample_rate
    conn.close()


def test_synthesize_streams_pcm16(server):
    srv, service = server
    sr = CFG.dsp.sample_rate
    rng = np.random.default_rng(0)
    dur = 2.0  # long enough for several 8-frame chunks
    wav = (0.3 * np.sin(2 * np.pi * 220 *
                        np.arange(int(dur * sr)) / sr)
           + 0.01 * rng.standard_normal(int(dur * sr))).astype(np.float32)
    conn, r = _post(srv, "/synthesize?temperature=0.8", _wav_body(wav, sr))
    assert r.status == 200
    assert r.getheader("X-Sample-Rate") == str(sr)
    data = r.read()  # http.client reassembles chunked transfer
    conn.close()
    out = np.frombuffer(data, "<i2").astype(np.float32) / 32767.0
    hop = CFG.dsp.hop_length
    F = len(wav) // hop
    # cover_tail: the full utterance is synthesized, ragged tail included
    assert len(out) == F * hop
    assert np.isfinite(out).all() and np.abs(out).max() <= 1.0
    # not silence (the vocoder actually ran)
    assert np.abs(out).max() > 1e-4


def test_short_utterance_falls_back_to_whole_call(server):
    srv, service = server
    sr = CFG.dsp.sample_rate
    wav = 0.2 * np.sin(
        2 * np.pi * 220 * np.arange(int(0.12 * sr)) / sr
    ).astype(np.float32)
    conn, r = _post(srv, "/synthesize", _wav_body(wav, sr))
    assert r.status == 200
    out = np.frombuffer(r.read(), "<i2")
    conn.close()
    assert len(out) > 0 and np.isfinite(out.astype(np.float32)).all()


def test_bad_request_and_unknown_path(server):
    srv, service = server
    conn, r = _post(srv, "/synthesize", b"this is not a wav")
    assert r.status == 400
    r.read(); conn.close()
    conn, r = _post(srv, "/nope", b"")
    assert r.status == 404
    r.read(); conn.close()


def test_slow_client_does_not_hold_the_device(server):
    """Device production drains into a host buffer: a client that stops
    reading mid-response must not block another request (the lock is
    held only while the chip computes)."""
    srv, service = server
    sr = CFG.dsp.sample_rate
    wav = 0.25 * np.sin(
        2 * np.pi * 330 * np.arange(2 * sr) / sr
    ).astype(np.float32)
    body = _wav_body(wav, sr)

    conn_a, r_a = _post(srv, "/synthesize", body)
    assert r_a.status == 200
    first_a = r_a.read(512)  # then stop reading — slow client

    # second request completes fully while A's response is unread
    conn_b, r_b = _post(srv, "/synthesize", body)
    assert r_b.status == 200
    out_b = r_b.read()
    conn_b.close()
    assert len(out_b) > 0

    rest_a = r_a.read()
    conn_a.close()
    assert len(first_a) + len(rest_a) == len(out_b)


def test_streamed_equals_generator_with_deemphasis(server):
    """The HTTP path must equal synthesize_chunks' own output (PCM16
    quantization aside) — no resampling/ordering surprises in the
    chunked-transfer plumbing."""
    srv, service = server
    sr = CFG.dsp.sample_rate
    wav = 0.25 * np.sin(
        2 * np.pi * 330 * np.arange(2 * sr) / sr
    ).astype(np.float32)

    served = service.requests_served
    conn, r = _post(srv, "/synthesize", _wav_body(wav, sr))
    got = np.frombuffer(r.read(), "<i2").astype(np.float32) / 32767.0
    conn.close()

    # replay the generator with the same key the server used
    import itertools

    service._counter = itertools.count(served)
    # wav round-trips through PCM16 in the request body
    wav_q = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
    wav_rt = wav_q.astype(np.float32) / 32768.0
    ref = np.concatenate(
        list(service.synthesize_chunks(wav_rt, temperature=1.0))
    )
    service._counter = itertools.count(served + 2)  # past the replay
    assert len(got) == len(ref)
    # PCM16 on the wire clips to [-1, 1]; mirror it on the reference
    # (the untrained test model can exceed full scale)
    np.testing.assert_allclose(
        got, np.clip(ref, -1.0, 1.0), atol=1.0 / 32767 + 1e-6
    )


def test_malformed_content_length_400(server):
    """A non-integer Content-Length must get a 400, not an unhandled
    ValueError that drops the connection with no response."""
    srv, service = server
    conn = http.client.HTTPConnection(*srv.server_address, timeout=60)
    conn.putrequest("POST", "/synthesize")
    conn.putheader("Content-Length", "12abc")
    conn.endheaders()
    r = conn.getresponse()
    assert r.status == 400
    r.read()
    conn.close()


def test_oversize_body_rejected_413(server):
    """Request-body cap (VERDICT r3 weak item 5): a huge Content-Length
    must be refused before any read, not buffered into RAM."""
    srv, service = server
    conn = http.client.HTTPConnection(*srv.server_address, timeout=60)
    # claim a 1 GB body but send none — the server must answer on the
    # header alone
    conn.request(
        "POST", "/synthesize", body=None,
        headers={"Content-Length": str(1 << 30)},
    )
    r = conn.getresponse()
    assert r.status == 413
    r.read()
    conn.close()


def test_busy_server_503_with_retry_after():
    """Past max_pending admissions the server sheds load with 503 +
    Retry-After instead of queueing unboundedly behind the device."""
    _, variables = init_student(CFG, jax.random.PRNGKey(0))
    service = VocoderService(
        CFG, variables["params"], chunk_frames=8, max_pending=0
    )
    srv = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        sr = CFG.dsp.sample_rate
        wav = 0.1 * np.sin(
            2 * np.pi * 220 * np.arange(sr) / sr
        ).astype(np.float32)
        conn, r = _post(srv, "/synthesize", _wav_body(wav, sr))
        assert r.status == 503
        assert r.getheader("Retry-After") is not None
        r.read()
        conn.close()
    finally:
        srv.shutdown()


def test_two_concurrent_clients_both_succeed(server):
    """Two simultaneous synthesis requests (within max_pending) must
    both stream to completion."""
    srv, service = server
    sr = CFG.dsp.sample_rate
    wav = 0.25 * np.sin(
        2 * np.pi * 440 * np.arange(2 * sr) / sr
    ).astype(np.float32)
    body = _wav_body(wav, sr)
    results = [None, None]

    def client(i):
        conn, r = _post(srv, "/synthesize", body)
        results[i] = (r.status, len(r.read()))
        conn.close()

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert all(r is not None for r in results), results
    for status, n in results:
        assert status == 200
        assert n > 0
    assert results[0][1] == results[1][1]


def test_abandoned_consumer_releases_device_lock():
    """Bounded-queue regression guard: a client that disappears while
    the chunk queue is full must not leave the producer blocked on
    q.put holding the device lock forever."""
    _, variables = init_student(CFG, jax.random.PRNGKey(0))
    service = VocoderService(
        CFG, variables["params"], chunk_frames=8, queue_chunks=1
    )
    sr = CFG.dsp.sample_rate
    wav = 0.1 * np.sin(
        2 * np.pi * 220 * np.arange(4 * sr) / sr
    ).astype(np.float32)
    gen = service.synthesize_chunks(wav, temperature=1.0)
    next(gen)     # producer running, queue (size 1) fills behind us
    gen.close()   # client gone — GeneratorExit sets the abandoned flag
    acquired = service.lock.acquire(timeout=30)
    assert acquired, "producer still holds the device lock"
    service.lock.release()


def test_batch_engine_rows_match_direct_stream():
    """Cross-request batching exactness: one batched-kernel call over
    jobs from DIFFERENT requests (distinct keys, temperatures, window
    positions — including the partial tail window, and a padded row:
    3 jobs -> bucket 4) reproduces the direct streaming path's chunks
    row for row (in-jit fold_in noise ≡ z_at's host block stream)."""
    from concurrent.futures import Future

    from pwn_tpu.generate import (
        _stream_geometry,
        _stream_plan,
        mel_from_wav,
        stream_student_chunks,
    )
    from pwn_tpu.serve import _Job

    _, variables = init_student(CFG, jax.random.PRNGKey(0))
    service = VocoderService(CFG, variables["params"], chunk_frames=8,
                             batch_max=4)
    try:
        sr = CFG.dsp.sample_rate
        wav = 0.3 * np.sin(
            2 * np.pi * 260 * np.arange(int(1.5 * sr)) / sr
        ).astype(np.float32)
        mel = np.asarray(mel_from_wav(CFG, wav))
        F = mel.shape[1]
        _, _, CT, WT, WF = _stream_geometry(CFG, 8)
        plan = list(_stream_plan(CFG, F, 8, True))
        assert plan[-1][4] > 0, "test wav should produce a tail chunk"
        picks = [0, len(plan) // 2, len(plan) - 1]
        temps = [1.0, 0.8, 0.5]
        jobs = []
        for j, (i, T) in enumerate(zip(picks, temps)):
            ws, f_start, off, out_off, trim = plan[i]
            jobs.append(_Job(
                mel[:, f_start: f_start + WF],
                np.asarray(jax.random.PRNGKey(100 + j), np.uint32),
                ws, off, out_off, T, Future(),
            ))
        service.engine._execute(jobs)
        for j, (i, T) in enumerate(zip(picks, temps)):
            got = jobs[j].future.result(timeout=60)
            assert got.shape == (CT,)
            ref_chunks = list(stream_student_chunks(
                CFG, variables["params"], mel,
                key=jax.random.PRNGKey(100 + j), chunk_frames=8,
                temperature=T, cover_tail=True,
            ))
            trim = plan[i][4]
            np.testing.assert_allclose(
                got[trim:], ref_chunks[i][0], rtol=1e-5, atol=1e-5,
                err_msg=f"row {j} (plan window {i}, T={T})",
            )
        assert service.engine.calls == 1
        assert service.engine.rows == 3
    finally:
        service.close()


@pytest.fixture(scope="module")
def server_batched():
    _, variables = init_student(CFG, jax.random.PRNGKey(0))
    service = VocoderService(CFG, variables["params"], chunk_frames=8,
                             batch_max=4, batch_window_ms=10.0)
    srv = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, service
    srv.shutdown()
    service.close()


def test_concurrent_clients_batched_equal_sequential(server_batched):
    """With the batch engine on, two concurrent HTTP clients must
    stream EXACTLY what two sequential requests with the same keys
    would have — batching (whatever mix of window groupings the race
    produced) is invisible in the audio."""
    srv, service = server_batched
    sr = CFG.dsp.sample_rate
    wav = 0.25 * np.sin(
        2 * np.pi * 330 * np.arange(2 * sr) / sr
    ).astype(np.float32)
    body = _wav_body(wav, sr)
    served = service.requests_served
    outs = [None, None]

    def client(i):
        conn, r = _post(srv, "/synthesize", body)
        assert r.status == 200
        outs[i] = np.frombuffer(r.read(), "<i2").astype(np.float32) \
            / 32767.0
        conn.close()

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert all(o is not None for o in outs)

    # sequential replay with the same two request keys (arrival order
    # of the concurrent clients is the only nondeterminism)
    import itertools

    wav_rt = (np.clip(wav, -1, 1) * 32767).astype(np.int16) \
        .astype(np.float32) / 32768.0
    service._counter = itertools.count(served)
    refs = [
        np.clip(np.concatenate(
            list(service.synthesize_chunks(wav_rt, temperature=1.0))
        ), -1.0, 1.0)
        for _ in range(2)
    ]
    service._counter = itertools.count(served + 4)
    assert not np.allclose(refs[0], refs[1]), \
        "distinct keys must give distinct noise streams"

    tol = 1.0 / 32767 + 1e-5

    def matches(a, b):
        return a.shape == b.shape and np.allclose(a, b, atol=tol)

    ok = (matches(outs[0], refs[0]) and matches(outs[1], refs[1])) or \
         (matches(outs[0], refs[1]) and matches(outs[1], refs[0]))
    assert ok, "each client's stream must equal one sequential replay"
    assert service.engine.calls > 0


def test_batched_single_client_whole_path(server_batched):
    """Engine on, one client: output is well-formed and full-length
    (the no-other-pending fast path must not drop or reorder)."""
    srv, service = server_batched
    sr = CFG.dsp.sample_rate
    wav = 0.25 * np.sin(
        2 * np.pi * 220 * np.arange(int(1.3 * sr)) / sr
    ).astype(np.float32)
    conn, r = _post(srv, "/synthesize?temperature=0.7", _wav_body(wav, sr))
    assert r.status == 200
    out = np.frombuffer(r.read(), "<i2").astype(np.float32) / 32767.0
    conn.close()
    F = len(wav) // CFG.dsp.hop_length
    assert len(out) == F * CFG.dsp.hop_length
    assert np.isfinite(out).all() and np.abs(out).max() > 1e-4


def test_healthz_latency_stats_and_occupancy(server):
    """/healthz carries TTFB percentiles + realized batch occupancy
    (VERDICT r4 item 6: the serving observability that made the r4
    batching case must live in the server, not an offline script)."""
    import json

    srv, service = server
    sr = CFG.dsp.sample_rate
    wav = 0.2 * np.sin(
        2 * np.pi * 220 * np.arange(int(1.0 * sr)) / sr
    ).astype(np.float32)
    conn, r = _post(srv, "/synthesize", _wav_body(wav, sr))
    assert r.status == 200
    r.read(); conn.close()

    conn = http.client.HTTPConnection(*srv.server_address, timeout=60)
    conn.request("GET", "/healthz")
    body = json.loads(conn.getresponse().read())
    conn.close()
    assert body["ttfb"]["count"] >= 1
    assert body["ttfb"]["p50_ms"] > 0
    assert body["ttfb"]["p99_ms"] >= body["ttfb"]["p50_ms"]
    assert body["draining"] is False
    assert "batch_rows_per_call" in body and "batch_retries" in body


def test_draining_sheds_with_503(server):
    """Graceful-shutdown admission stop: draining answers 503 while the
    listener is still up (serve_forever's SIGTERM path flips this, then
    drain_and_close waits for pending to hit 0)."""
    srv, service = server
    sr = CFG.dsp.sample_rate
    wav = 0.2 * np.sin(
        2 * np.pi * 220 * np.arange(sr) / sr
    ).astype(np.float32)
    service.draining = True
    try:
        conn, r = _post(srv, "/synthesize", _wav_body(wav, sr))
        assert r.status == 503
        assert r.getheader("Retry-After")
        r.read(); conn.close()
    finally:
        service.draining = False


def test_drain_and_close_waits_for_pending():
    from pwn_tpu.serve import drain_and_close, make_server

    _, variables = init_student(CFG, jax.random.PRNGKey(0))
    service = VocoderService(CFG, variables["params"], chunk_frames=8,
                             batch_max=2)
    srv = make_server(service, "127.0.0.1", 0)
    assert service.try_admit()
    t0 = [None]

    def release_later():
        import time

        time.sleep(0.4)
        t0[0] = "released"
        service.release()

    threading.Thread(target=release_later, daemon=True).start()
    drain_and_close(service, srv, timeout_s=10.0)
    assert t0[0] == "released"  # waited for the in-flight stream
    assert service.pending == 0
    assert service.draining
    # engine thread stopped
    assert not service.engine._thread.is_alive()


def test_batch_engine_retries_transient_failure(monkeypatch):
    """One transient device-call failure must not fail every co-batched
    stream: the engine retries the call once (ADVICE r4)."""
    from concurrent.futures import Future

    import pwn_tpu.generate as gen_mod
    from pwn_tpu.serve import _Job

    _, variables = init_student(CFG, jax.random.PRNGKey(0))
    service = VocoderService(CFG, variables["params"], chunk_frames=8,
                             batch_max=2)
    try:
        calls = {"n": 0}

        def flaky(cfg, cf, B):
            def fn(params, mels, keys, ws, off, out_off, temp):
                calls["n"] += 1
                if calls["n"] == 1:
                    raise RuntimeError("transient device error")
                return np.ones((B, 8 * cfg.dsp.hop_length), np.float32)

            return fn

        monkeypatch.setattr(gen_mod, "_batched_stream_window_fn", flaky)
        job = _Job(
            np.zeros((1, 16, CFG.dsp.n_mels), np.float32),
            np.zeros(2, np.uint32), 0, 0, 0, 1.0, Future(),
        )
        service.engine._execute([job])
        out = job.future.result(timeout=30)
        assert out.shape == (8 * CFG.dsp.hop_length,)
        assert service.engine.retries == 1
        assert service.engine.calls == 1

        # a PERSISTENT failure still fails the waiters (after 1 retry)
        calls["n"] = -10**9  # always raise
        job2 = _Job(
            np.zeros((1, 16, CFG.dsp.n_mels), np.float32),
            np.zeros(2, np.uint32), 0, 0, 0, 1.0, Future(),
        )

        def always_fail(cfg, cf, B):
            def fn(*a):
                raise ValueError("hard failure")

            return fn

        monkeypatch.setattr(gen_mod, "_batched_stream_window_fn",
                            always_fail)
        service.engine._execute([job2])
        with pytest.raises(ValueError):
            job2.future.result(timeout=30)
    finally:
        service.close()


def test_engine_valueerror_not_mistaken_for_short_utterance(monkeypatch):
    """ADVICE r4: a ValueError relayed from the batch engine mid-stream
    must surface as an ERROR, not trigger the short-utterance
    whole-call fallback (which would append a full synthesis after
    already-streamed chunks)."""
    import pwn_tpu.generate as gen_mod

    _, variables = init_student(CFG, jax.random.PRNGKey(0))
    service = VocoderService(CFG, variables["params"], chunk_frames=8,
                             batch_max=2)
    try:
        def always_fail(cfg, cf, B):
            def fn(*a):
                raise ValueError("looks like a bad-arg error")

            return fn

        monkeypatch.setattr(gen_mod, "_batched_stream_window_fn",
                            always_fail)
        sr = CFG.dsp.sample_rate
        wav = 0.2 * np.sin(
            2 * np.pi * 220 * np.arange(2 * sr) / sr
        ).astype(np.float32)
        with pytest.raises(ValueError, match="bad-arg"):
            for _ in service.synthesize_chunks(wav, temperature=1.0):
                pass
    finally:
        service.close()


def _mel_body(mel):
    buf = io.BytesIO()
    np.save(buf, mel)
    return buf.getvalue()


def test_synthesize_from_mel_npy(server):
    """An .npy body conditions the vocoder on the mel directly (the
    production TTS-acoustic-model input), equal in output length and
    convention to the wav path over the same mel."""
    srv, service = server
    sr = CFG.dsp.sample_rate
    wav = 0.25 * np.sin(
        2 * np.pi * 330 * np.arange(2 * sr) / sr
    ).astype(np.float32)
    from pwn_tpu.generate import mel_from_wav

    mel = np.asarray(mel_from_wav(CFG, wav)[0], np.float32)  # (F, n_mels)
    conn, r = _post(srv, "/synthesize?temperature=0.8", _mel_body(mel))
    assert r.status == 200
    assert r.getheader("X-Sample-Rate") == str(sr)
    out = np.frombuffer(r.read(), "<i2").astype(np.float32) / 32767.0
    conn.close()
    hop = CFG.dsp.hop_length
    F = mel.shape[0]
    # cover_tail: full mel synthesized, ragged tail included
    assert len(out) == F * hop
    assert np.isfinite(out).all() and np.abs(out).max() > 1e-4


def test_bad_mel_rejected_400(server):
    srv, service = server
    # wrong band count
    conn, r = _post(srv, "/synthesize",
                    _mel_body(np.zeros((40, 7), np.float32)))
    assert r.status == 400
    r.read(); conn.close()
    # non-finite values
    bad = np.full((40, CFG.dsp.n_mels), np.nan, np.float32)
    conn, r = _post(srv, "/synthesize", _mel_body(bad))
    assert r.status == 400
    r.read(); conn.close()


def test_coerce_mel_shapes():
    from pwn_tpu.generate import coerce_mel

    m = np.zeros((12, CFG.dsp.n_mels), np.float32)
    assert coerce_mel(CFG, m).shape == (1, 12, CFG.dsp.n_mels)
    assert coerce_mel(CFG, m[None]).shape == (1, 12, CFG.dsp.n_mels)
    with pytest.raises(ValueError):
        coerce_mel(CFG, np.zeros((12, CFG.dsp.n_mels + 1), np.float32))
    with pytest.raises(ValueError):
        coerce_mel(CFG, np.zeros((2, 12, CFG.dsp.n_mels), np.float32))
