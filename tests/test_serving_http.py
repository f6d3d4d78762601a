"""TTSService (model.serve) and the stdlib HTTP front end."""

from __future__ import annotations

import json
import threading
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from synthetic_ckpt import StubTokenizer, write_checkpoint


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from qwen3tts_tpu.tts import Qwen3TTSModel

    d = write_checkpoint(str(tmp_path_factory.mktemp("srvckpt")))
    m = Qwen3TTSModel.from_pretrained(d, dtype=jnp.float32)
    m.tokenizer = StubTokenizer()
    return m


def test_service_submit(model):
    with model.serve(
        slots=2, chunk_frames=3, max_frames=16,
        prompt_bucket=64, trailing_bucket=16,
    ) as svc:
        futs = [
            svc.submit(f"Hello number {i}", speaker="Aiden", max_tokens=6,
                       seed=i)
            for i in range(3)
        ]
        outs = [f.result(timeout=600) for f in futs]
    for a in outs:
        assert isinstance(a, np.ndarray)
        assert a.ndim == 1 and a.shape[0] > 0
        assert np.isfinite(a).all()


def test_service_validates(model):
    with model.serve(slots=1, max_frames=16, prompt_bucket=64,
                     trailing_bucket=16) as svc:
        with pytest.raises(Exception):
            svc.submit("Hi", speaker="NoSuchSpeaker").result(timeout=60)


def test_http_server(model):
    from qwen3tts_tpu.serving_http import make_server

    with model.serve(
        slots=2, chunk_frames=3, max_frames=16,
        prompt_bucket=64, trailing_bucket=16,
    ) as svc:
        srv = make_server(svc, "127.0.0.1", 0)
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{port}"
            with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
                assert json.loads(r.read())["ok"] is True

            req = urllib.request.Request(
                base + "/synthesize",
                data=json.dumps(
                    {"text": "Hello web", "speaker": "Aiden", "max_tokens": 6}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                body = r.read()
                assert r.headers["Content-Type"] == "audio/wav"
            assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"

            # bad request: missing text
            bad = urllib.request.Request(
                base + "/synthesize", data=b"{}",
                headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=30)
            assert ei.value.code == 400

            # bad request: unknown speaker (a Qwen3TTSError from validation)
            # must be a clean 400 on BOTH endpoints — not a reset connection
            # (/synthesize) or a truncated chunked WAV (/synthesize_stream)
            # [round-3 verdict #2]
            for path in ("/synthesize", "/synthesize_stream"):
                badspk = urllib.request.Request(
                    base + path,
                    data=json.dumps({"text": "x", "speaker": "NoSuch"}).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(badspk, timeout=60)
                assert ei.value.code == 400, path
                assert "NoSuch" in json.loads(ei.value.read())["error"]
        finally:
            srv.shutdown()


def test_http_overload_429(model):
    """A full bounded queue surfaces as HTTP 429 (serving.ServiceOverloaded
    from Qwen3TTSServer.submit -> serving_http's 429 mapping)."""
    from qwen3tts_tpu.serving_http import make_server

    with model.serve(
        slots=1, chunk_frames=3, max_frames=16,
        prompt_bucket=64, trailing_bucket=16, max_queue=1,
    ) as svc:
        srv = make_server(svc, "127.0.0.1", 0)
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{port}"

            codes = []

            def post_one(i):
                req = urllib.request.Request(
                    base + "/synthesize",
                    data=json.dumps(
                        {"text": f"flood {i}", "speaker": "Aiden",
                         "max_tokens": 8}
                    ).encode(),
                    headers={"Content-Type": "application/json"},
                )
                try:
                    with urllib.request.urlopen(req, timeout=600) as r:
                        codes.append(r.status)
                except urllib.error.HTTPError as e:
                    codes.append(e.code)

            threads = [threading.Thread(target=post_one, args=(i,))
                       for i in range(8)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            assert 429 in codes, codes  # the flood's tail was shed
            assert 200 in codes, codes  # accepted requests completed
            assert set(codes) <= {200, 429}
        finally:
            srv.shutdown()


def test_http_stream_endpoint(model):
    """POST /synthesize_stream returns chunked WAV whose PCM concatenates
    to the full utterance (header + PCM16 frames via AudioChunkEvent)."""
    import http.client

    from qwen3tts_tpu.serving_http import make_server

    with model.serve(
        slots=1, chunk_frames=3, max_frames=16,
        prompt_bucket=64, trailing_bucket=16,
    ) as svc:
        srv = make_server(svc, "127.0.0.1", 0)
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request(
                "POST",
                "/synthesize_stream",
                body=json.dumps(
                    {"text": "Chunked stream", "speaker": "Aiden",
                     "max_tokens": 8, "chunk_frames": 2}
                ),
                headers={"Content-Type": "application/json"},
            )
            r = conn.getresponse()
            assert r.status == 200
            assert r.headers["Content-Type"] == "audio/wav"
            body = r.read()  # http.client decodes the chunked framing
            conn.close()
        finally:
            srv.shutdown()
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    assert b"data" in body[:44]
    pcm = np.frombuffer(body[44:], dtype="<i2")
    assert pcm.size > 0 and pcm.size % 1920 == 0  # whole codec frames
