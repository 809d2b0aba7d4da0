"""Streaming vocoder HTTP server — the production serving path.

The reference had no serving story at all: `generate.py` [R] was a
one-shot script (SURVEY.md §3.2).  This module operationalizes the
TPU-side serving features measured in BASELINE.md into a deployable
endpoint:

- checkpoint -> params via the `eval_shape` restore template (~3 s
  cold start, no throwaway init compile);
- the per-(config, chunk) cached streaming window jit (warm
  time-to-first-chunk ~45 ms on v5e);
- EMA (Polyak) serving params when the checkpoint carries them;
- the persistent compilation cache, so process restarts reuse
  compiled executables.

Protocol (stdlib-only, chunked transfer):

- ``GET /healthz``  -> ``{"status": "ok", ...}``
- ``POST /synthesize[?temperature=T&chunk_frames=N]`` with either a
  RIFF wav body (copy-synthesis conditioning, like the reference's
  generate) or an ``.npy`` body holding a ``(frames, n_mels)`` float
  mel (the production vocoder input — a TTS acoustic model's output;
  convention at ``generate.coerce_mel``) -> streamed raw little-endian
  PCM16 mono; sample rate in the ``X-Sample-Rate`` response header.
  Chunks are produced as the TPU emits them — playback can start ~one
  chunk after the request.

One device, one compute stream: requests serialize on a lock; the
HTTP layer is threaded so health checks never queue behind synthesis.

Resource bounds (VERDICT r3 weak item 5):

- request bodies are capped (``413`` past ``max_body_bytes``, default
  64 MB) — previously one multi-GB POST could OOM the host;
- concurrent synthesis admissions are bounded (``503`` +
  ``Retry-After`` past ``max_pending``) so a burst cannot pile up
  unbounded producer threads behind the device lock;
- the per-request chunk buffer is a BOUNDED queue (``queue_chunks``
  chunks ≈ tens of seconds of audio): a slow client buffers bounded
  host RAM; in the pathological case (buffer full AND client stalled)
  the producer blocks holding the device lock, but total damage is
  bounded by ``max_pending`` admissions, each of bounded RAM.
"""

from __future__ import annotations

import io
import itertools
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional
from urllib.parse import parse_qs, urlparse

import jax
import numpy as np
from scipy.io import wavfile
from scipy.signal import lfilter, resample_poly

from pwn_tpu.config import Config


def _pcm16(x: np.ndarray) -> bytes:
    return (np.clip(x, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()


class _Deemph:
    """Streaming 1-pole deemphasis: x[t] = y[t] + coef * x[t-1], state
    carried across chunks so streamed output equals the whole-call
    `dsp.deemphasis` sample-for-sample."""

    def __init__(self, coef: float):
        self.coef = coef
        self._zi = np.zeros(1, np.float64)

    def __call__(self, y: np.ndarray) -> np.ndarray:
        if self.coef == 0.0:
            return y
        x, self._zi = lfilter(
            [1.0], [1.0, -self.coef], y.astype(np.float64), zi=self._zi
        )
        return x.astype(np.float32)


class VocoderService:
    """Config + params + the device lock; shared by all HTTP threads."""

    def __init__(self, cfg: Config, params: Any,
                 chunk_frames: int = 64, max_pending: int = 4,
                 queue_chunks: int = 64,
                 max_body_bytes: int = 64 * 2 ** 20):
        self.cfg = cfg
        self.params = params
        self.chunk_frames = chunk_frames
        self.max_pending = max_pending
        self.queue_chunks = queue_chunks
        self.max_body_bytes = max_body_bytes
        self.lock = threading.Lock()  # one chip, one compute stream
        self._counter = itertools.count()  # atomic under the GIL
        self._pending = 0
        self._pending_lock = threading.Lock()
        self.requests_served = 0

    def try_admit(self) -> bool:
        """Reserve a synthesis slot; False when the server is saturated
        (the HTTP layer then answers 503 + Retry-After instead of
        queueing unboundedly behind the device lock)."""
        with self._pending_lock:
            if self._pending >= self.max_pending:
                return False
            self._pending += 1
            return True

    def release(self) -> None:
        with self._pending_lock:
            self._pending -= 1

    @property
    def pending(self) -> int:
        with self._pending_lock:
            return self._pending

    @classmethod
    def from_workdir(cls, cfg: Config, workdir: str,
                     chunk_frames: int = 64) -> "VocoderService":
        import os

        from pwn_tpu.training.common import serving_params
        from pwn_tpu.training.loop import abstract_state_template
        from pwn_tpu.utils.checkpoint import CheckpointManager

        state = abstract_state_template(cfg, "student")
        mngr = CheckpointManager(
            os.path.join(os.path.abspath(workdir), "ckpt_student")
        )
        state, step = mngr.restore(state)
        mngr.close()
        # device-commit once: the restore yields host numpy, and a host
        # tree as a jit arg re-uploads per chunk call (see loop.py
        # run_distillation for the measured cost of that pattern)
        return cls(cfg, jax.device_put(serving_params(state)),
                   chunk_frames)

    def synthesize_chunks(self, wav: np.ndarray, temperature: float,
                          chunk_frames: Optional[int] = None):
        """Yield deemphasized float32 waveform chunks for a conditioning
        WAVEFORM (copy-synthesis).  The wav->mel runs in host numpy
        (`generate.mel_from_wav_host`, allclose-pinned to the device
        pipeline): on-device eager mel compiles PER REQUEST LENGTH over
        the axon tunnel (measured up to ~15 s/clip cold, r4) — a server
        receiving arbitrary-length wavs must not pay that at request
        time."""
        from pwn_tpu.generate import mel_from_wav_host

        return self.synthesize_chunks_from_mel(
            mel_from_wav_host(self.cfg, wav.astype(np.float32))[None],
            temperature, chunk_frames,
        )

    def synthesize_chunks_from_mel(self, mel, temperature: float,
                                   chunk_frames: Optional[int] = None):
        """Yield deemphasized float32 waveform chunks for a conditioning
        mel (1, F, n_mels) — the production vocoder input (a TTS
        acoustic model's output; convention documented at
        `generate.coerce_mel`).  Utterances shorter than one streaming
        window fall back to a single whole-call chunk.

        Device work runs in a producer thread draining into a BOUNDED
        queue (`queue_chunks`), so the device lock is held only while
        the chip computes and a slow client buffers bounded host RAM.
        In the pathological case (queue full AND the client stalled,
        not gone) the producer blocks holding the device lock until the
        client reads or disconnects — total damage is bounded by
        `max_pending` admissions (see the module docstring's resource-
        bounds contract).
        """
        import queue

        from pwn_tpu.generate import (
            generate_student,
            stream_student_chunks,
        )

        cf = chunk_frames or self.chunk_frames
        # keep the mel host-resident: eager slices of a device array
        # (mel[:, :Fp] below) compile per distinct request length over
        # the tunnel (~0.5 s TTFB per novel length, measured r4);
        # numpy slicing is free and the streaming path ships fixed-size
        # windows to the device anyway
        mel = np.asarray(mel)
        # per-request noise stream; itertools.count is atomic, so two
        # threads entering together still get distinct keys
        req_id = next(self._counter)
        key = jax.random.PRNGKey(req_id)
        self.requests_served = req_id + 1
        F = mel.shape[1]
        Fp = F - F % cf
        deemph = _Deemph(self.cfg.dsp.preemphasis)
        q: "queue.Queue" = queue.Queue(maxsize=self.queue_chunks)

        # abandonment protocol for the BOUNDED queue: if the consumer
        # generator is closed (client gone) while the queue is full, the
        # producer must NOT block on q.put holding the device lock — it
        # polls this flag and stops producing instead
        abandoned = threading.Event()

        def put(item) -> bool:
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce() -> None:
            with self.lock:
                try:
                    try:
                        if Fp < cf:
                            raise ValueError("short utterance")
                        # cover_tail: the final F % cf frames stream as
                        # one partial chunk instead of being dropped
                        # (up to cf*hop-1 samples — the end of the last
                        # word on real speech)
                        for chunk in stream_student_chunks(
                            self.cfg, self.params, mel, key=key,
                            chunk_frames=cf, temperature=temperature,
                            cover_tail=True,
                        ):
                            if not put(("chunk", chunk[0])):
                                return
                    except ValueError:
                        # shorter than one overlap window: one-shot
                        # generate_student, which deemphasizes
                        # internally — emitted as "whole" so the
                        # consumer skips its deemphasis filter
                        if not put(("whole", np.asarray(generate_student(
                            self.cfg, self.params, mel, key,
                            temperature=temperature,
                        )))):
                            return
                except Exception as e:  # noqa: BLE001 — relay to client
                    put(("error", e))
                put(("done", None))

        threading.Thread(target=produce, daemon=True).start()
        try:
            while True:
                kind, payload = q.get()
                if kind == "done":
                    return
                if kind == "error":
                    raise payload
                yield deemph(payload) if kind == "chunk" else payload
        finally:
            abandoned.set()


def _make_handler(service: VocoderService):
    sr = service.cfg.dsp.sample_rate

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # required for chunked transfer

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "device": str(jax.devices()[0]),
                    "sample_rate": sr,
                    "chunk_frames": service.chunk_frames,
                    "requests_served": service.requests_served,
                    "pending": service.pending,
                    "max_pending": service.max_pending,
                })
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/synthesize":
                self._json(404, {"error": "unknown path"})
                return
            q = parse_qs(url.query)
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self.close_connection = True
                self._json(400, {"error": "bad Content-Length"})
                return
            if n > service.max_body_bytes:
                # drain nothing — answer and close (keep-alive off so the
                # unread body doesn't poison the connection)
                self.close_connection = True
                self._json(413, {
                    "error": f"body {n} bytes exceeds limit "
                             f"{service.max_body_bytes}"
                })
                return
            # shed load BEFORE paying for body decode/resample/mel
            # parse: a saturated server answering 503 late still burns
            # seconds of CPU per shed request on big bodies
            if not service.try_admit():
                self.close_connection = True  # body unread
                self.send_response(503)
                self.send_header("Retry-After", "1")
                body = json.dumps({"error": "server busy: "
                                   f"{service.max_pending} syntheses "
                                   "already pending"}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            try:
                mel = None
                try:
                    temperature = float(q.get("temperature", ["1.0"])[0])
                    cf = int(q.get("chunk_frames",
                                   [str(service.chunk_frames)])[0])
                    body = self.rfile.read(n)
                    if body[:6] == b"\x93NUMPY":
                        # .npy body = direct mel conditioning (the
                        # production vocoder input; convention
                        # documented at generate.coerce_mel / README)
                        from pwn_tpu.generate import coerce_mel

                        mel = coerce_mel(service.cfg, np.load(
                            io.BytesIO(body), allow_pickle=False))
                    else:
                        in_sr, data = wavfile.read(io.BytesIO(body))
                        if data.dtype == np.int16:
                            wav = data.astype(np.float32) / 32768.0
                        else:
                            wav = data.astype(np.float32)
                        if wav.ndim == 2:
                            wav = wav.mean(axis=1)
                        if in_sr != sr:
                            g = int(np.gcd(sr, in_sr))
                            wav = resample_poly(wav, sr // g, in_sr // g)
                except Exception as e:
                    self._json(400, {"error": f"bad request: {e!r}"})
                    return
                try:
                    chunks = (
                        service.synthesize_chunks_from_mel(
                            mel, temperature, cf)
                        if mel is not None
                        else service.synthesize_chunks(
                            wav, temperature, cf)
                    )
                    first = next(chunks)  # surface errors before headers
                except Exception as e:
                    self._json(500, {"error": repr(e)})
                    return
                self.send_response(200)
                self.send_header("Content-Type", "audio/L16")
                self.send_header("X-Sample-Rate", str(sr))
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def send(payload: bytes) -> None:
                    self.wfile.write(f"{len(payload):X}\r\n".encode())
                    self.wfile.write(payload)
                    self.wfile.write(b"\r\n")

                send(_pcm16(first))
                for chunk in chunks:
                    send(_pcm16(chunk))
                self.wfile.write(b"0\r\n\r\n")
            finally:
                service.release()

    return Handler


def make_server(service: VocoderService, host: str = "127.0.0.1",
                port: int = 8600) -> ThreadingHTTPServer:
    """Build (not start) the server; tests drive it from a thread."""
    return ThreadingHTTPServer((host, port), _make_handler(service))


def serve_forever(cfg: Config, workdir: str, host: str, port: int,
                  chunk_frames: int = 64, max_pending: int = 4,
                  max_body_bytes: int = 64 * 2 ** 20) -> None:
    service = VocoderService.from_workdir(cfg, workdir, chunk_frames)
    service.max_pending = max_pending
    service.max_body_bytes = max_body_bytes
    # warm the window jit so the first request pays no compile
    warm = np.zeros(
        max((chunk_frames + 8) * cfg.dsp.hop_length * 2,
            cfg.dsp.win_length * 4),
        np.float32,
    )
    for _ in service.synthesize_chunks(warm, temperature=1.0):
        pass
    srv = make_server(service, host, port)
    print(f"serving {cfg.dsp.sample_rate} Hz vocoder on "
          f"http://{host}:{port}  (POST /synthesize, GET /healthz)")
    srv.serve_forever()
