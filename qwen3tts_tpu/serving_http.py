"""Minimal HTTP synthesis server over :class:`tts.TTSService`.

Stdlib-only (http.server) so it runs anywhere the package does. One
model-owned service thread does the continuous-batched decoding; HTTP
threads block on their request's Future and stream the WAV back.

  POST /synthesize   {"text": ..., "speaker"?: ..., "instruct"?: ...,
                      "language"?: "auto", "seed"?: 0, "max_tokens"?: 2048}
                     -> 200 audio/wav | 400 {"error": ...}
  GET  /healthz      -> 200 {"ok": true, "requests": N}

Run: ``python -m qwen3tts_tpu.serving_http --model <dir> [--port 8080]``
(plus the from_pretrained knobs: --quantize int8, --slots N).

The reference has no serving story (batch-1 library calls only) — this is
part of the production-serving extension (SURVEY.md §2.4).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_server(service, host: str = "127.0.0.1", port: int = 8080):
    """Build a ThreadingHTTPServer bound to ``service`` (tts.TTSService)."""
    from .utils.audio import wav_bytes

    stats = {"requests": 0}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "requests": stats["requests"]})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/synthesize":
                return self._json(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                text = req["text"]
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                return self._json(400, {"error": f"bad request: {e}"})
            try:
                fut = service.submit(
                    text,
                    speaker=req.get("speaker"),
                    instruct=req.get("instruct"),
                    language=req.get("language", "auto"),
                    seed=int(req.get("seed", 0)),
                    max_tokens=int(req.get("max_tokens", 2048)),
                )
                audio = fut.result()
            except Exception as e:
                return self._json(400, {"error": str(e)})
            with lock:
                stats["requests"] += 1
            body = wav_bytes(audio)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    import argparse

    from .tts import Qwen3TTSModel

    ap = argparse.ArgumentParser(description="Qwen3-TTS HTTP server")
    ap.add_argument("--model", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--quantize", default=None, choices=[None, "int8"])
    ap.add_argument("--slots", type=int, default=4)
    args = ap.parse_args(argv)

    model = Qwen3TTSModel.from_pretrained(args.model, quantize=args.quantize)
    with model.serve(slots=args.slots) as service:
        srv = make_server(service, args.host, args.port)
        print(f"serving on http://{args.host}:{srv.server_address[1]}", flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            srv.shutdown()


if __name__ == "__main__":
    main()
