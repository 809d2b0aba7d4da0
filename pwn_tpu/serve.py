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
- ``POST /synthesize[?temperature=T&chunk_frames=N]`` with a RIFF wav
  body (copy-synthesis conditioning, like the reference's generate)
  -> streamed raw little-endian PCM16 mono; sample rate in the
  ``X-Sample-Rate`` response header.  Chunks are produced as the TPU
  emits them — playback can start ~one chunk after the request.

One device, one compute stream: requests serialize on a lock; the
HTTP layer is threaded so health checks never queue behind synthesis.
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
                 chunk_frames: int = 64):
        self.cfg = cfg
        self.params = params
        self.chunk_frames = chunk_frames
        self.lock = threading.Lock()  # one chip, one compute stream
        self._counter = itertools.count()  # atomic under the GIL
        self.requests_served = 0

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
        import jax

        return cls(cfg, jax.device_put(serving_params(state)),
                   chunk_frames)

    def synthesize_chunks(self, wav: np.ndarray, temperature: float,
                          chunk_frames: Optional[int] = None):
        """Yield deemphasized float32 waveform chunks for a conditioning
        waveform.  Utterances shorter than one streaming window fall
        back to a single whole-call chunk.

        Device work runs in a producer thread draining into a queue, so
        the device lock is held only while the chip computes — a client
        reading its response slowly buffers in host RAM (bounded by the
        utterance) instead of stalling other requests.
        """
        import queue

        from pwn_tpu.generate import (
            generate_student,
            mel_from_wav,
            stream_student_chunks,
        )

        cf = chunk_frames or self.chunk_frames
        mel = mel_from_wav(self.cfg, wav.astype(np.float32))
        # per-request noise stream; itertools.count is atomic, so two
        # threads entering together still get distinct keys
        req_id = next(self._counter)
        key = jax.random.PRNGKey(req_id)
        self.requests_served = req_id + 1
        F = mel.shape[1]
        Fp = F - F % cf
        deemph = _Deemph(self.cfg.dsp.preemphasis)
        q: "queue.Queue" = queue.Queue()

        def produce() -> None:
            with self.lock:
                try:
                    try:
                        if Fp < cf:
                            raise ValueError("short utterance")
                        for chunk in stream_student_chunks(
                            self.cfg, self.params, mel[:, :Fp], key=key,
                            chunk_frames=cf, temperature=temperature,
                        ):
                            q.put(("chunk", chunk[0]))
                    except ValueError:
                        # shorter than one overlap window (or ragged
                        # only): one-shot generate_student, which
                        # deemphasizes internally — emitted as "whole"
                        # so the consumer skips its deemphasis filter
                        q.put(("whole", np.asarray(generate_student(
                            self.cfg, self.params, mel, key,
                            temperature=temperature,
                        ))))
                except Exception as e:  # noqa: BLE001 — relay to client
                    q.put(("error", e))
                q.put(("done", None))

        threading.Thread(target=produce, daemon=True).start()
        while True:
            kind, payload = q.get()
            if kind == "done":
                return
            if kind == "error":
                raise payload
            yield deemph(payload) if kind == "chunk" else payload


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
                temperature = float(q.get("temperature", ["1.0"])[0])
                cf = int(q.get("chunk_frames",
                               [str(service.chunk_frames)])[0])
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                in_sr, data = wavfile.read(io.BytesIO(body))
            except Exception as e:
                self._json(400, {"error": f"bad request: {e!r}"})
                return
            if data.dtype == np.int16:
                wav = data.astype(np.float32) / 32768.0
            else:
                wav = data.astype(np.float32)
            if wav.ndim == 2:
                wav = wav.mean(axis=1)
            if in_sr != sr:
                g = int(np.gcd(sr, in_sr))
                wav = resample_poly(wav, sr // g, in_sr // g)
            try:
                chunks = service.synthesize_chunks(wav, temperature, cf)
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

    return Handler


def make_server(service: VocoderService, host: str = "127.0.0.1",
                port: int = 8600) -> ThreadingHTTPServer:
    """Build (not start) the server; tests drive it from a thread."""
    return ThreadingHTTPServer((host, port), _make_handler(service))


def serve_forever(cfg: Config, workdir: str, host: str, port: int,
                  chunk_frames: int = 64) -> None:
    service = VocoderService.from_workdir(cfg, workdir, chunk_frames)
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
