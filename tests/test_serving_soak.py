"""Concurrency soak: many threads hammering one server, dp and single-chip.

The serving worker owns all device state; submit() is the only cross-thread
surface. This shakes out ordering races the deterministic tests cannot
(interleaved submits during chunks, admissions racing close(), slot reuse
under bursty arrival) — every future must resolve with a sane result and
every request's codes must STILL equal its independent single-sequence
greedy run (per-slot state isolation under concurrency).
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.models import code_predictor as cp
from qwen3tts_tpu.models import generate as gen
from qwen3tts_tpu.models import talker as tk

from test_models import TINY_CP, TINY_TALKER

GREEDY = gen.SamplingConfig(
    temperature=0.0, top_k=0, top_p=1.0, repetition_penalty=1.0
)


@pytest.fixture(scope="module")
def params():
    talker = tk.init_talker_params(jax.random.PRNGKey(0), TINY_TALKER, jnp.float32)
    cpp = cp.init_code_predictor_params(
        jax.random.PRNGKey(1), TINY_CP, TINY_TALKER.hidden_size, jnp.float32
    )
    return talker, cpp


def _item(i):
    from qwen3tts_tpu.serving import BatchItem

    h = TINY_TALKER.hidden_size
    plen = 4 + (i * 7) % 9  # 4..12 (< prompt_bucket 16)
    cap = 2 + (i * 5) % 5  # 2..6
    p = jax.random.normal(jax.random.PRNGKey(1000 + i), (1, plen, h)) * 0.1
    t = jax.random.normal(jax.random.PRNGKey(2000 + i), (3, h)) * 0.1
    return BatchItem(prefill_embeds=p, trailing=t, max_steps=cap)


def _single(params, it):
    talker, cpp = params
    return gen.generate_codes(
        talker, cpp, talker_cfg=TINY_TALKER, cp_cfg=TINY_CP, sampling=GREEDY,
        prefill_embeds=it.prefill_embeds, prefill_len=jnp.int32(it.prefill_embeds.shape[1]),
        trailing_embeds=it.trailing, trailing_len=jnp.int32(3),
        tts_pad_embed=jnp.zeros((TINY_TALKER.hidden_size,)),
        cache=tk.make_cache(TINY_TALKER, 1, 64, jnp.float32),
        max_steps=jnp.int32(it.max_steps), max_frames=16,
        key=jax.random.PRNGKey(0),
    )


@pytest.mark.parametrize("dp", [0, 2])
def test_soak_threads(params, dp):
    from qwen3tts_tpu.serving import Qwen3TTSServer

    talker, cpp = params
    kw = {}
    if dp:
        from qwen3tts_tpu.parallel import mesh as pm

        kw["dp_mesh"] = pm.make_mesh(jax.devices()[:dp], tp=1)
    srv = Qwen3TTSServer(
        talker, cpp, talker_cfg=TINY_TALKER, cp_cfg=TINY_CP, sampling=GREEDY,
        tts_pad_embed=jnp.zeros((TINY_TALKER.hidden_size,)),
        slots=4, chunk_frames=2, max_frames=16,
        prompt_bucket=16, trailing_bucket=8, cache_len=64,
        dtype=jnp.float32, **kw,
    )
    N, THREADS = 18, 3
    items = [_item(i) for i in range(N)]
    futs: list = [None] * N
    lock = threading.Lock()
    cursor = [0]

    def submitter():
        while True:
            with lock:
                i = cursor[0]
                if i >= N:
                    return
                cursor[0] += 1
            futs[i] = srv.submit(items[i])

    threads = [threading.Thread(target=submitter) for _ in range(THREADS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    outs = [f.result(timeout=600) for f in futs]
    srv.close()

    for i, (it, out) in enumerate(zip(items, outs)):
        ref = _single(params, it)
        n = int(ref.n_frames)
        assert out.n_frames == n, f"request {i}: {out.n_frames} != {n}"
        np.testing.assert_array_equal(
            out.codes, np.asarray(ref.codes)[:n], err_msg=f"request {i}"
        )


@pytest.mark.parametrize("dp", [0, 2])
def test_soak_mixed_streams_and_batch(params, dp):
    """Round-5 soak: plain submits and submit_stream consumers hammer the
    SAME server concurrently — streamed requests publish progress between
    chunks while batch requests decode in the other slots; some streams
    are abandoned mid-utterance (slot cancel under load). Every completed
    request's codes must still equal its independent greedy run, and
    every stream's token events must match its own final codes."""
    from qwen3tts_tpu.serving import Qwen3TTSServer

    talker, cpp = params
    kw = {}
    if dp:
        from qwen3tts_tpu.parallel import mesh as pm

        kw["dp_mesh"] = pm.make_mesh(jax.devices()[:dp], tp=1)
    srv = Qwen3TTSServer(
        talker, cpp, talker_cfg=TINY_TALKER, cp_cfg=TINY_CP, sampling=GREEDY,
        tts_pad_embed=jnp.zeros((TINY_TALKER.hidden_size,)),
        slots=4, chunk_frames=2, max_frames=16,
        prompt_bucket=16, trailing_bucket=8, cache_len=64,
        dtype=jnp.float32, **kw,
    )
    N_BATCH, N_STREAM = 6, 6
    bitems = [_item(i) for i in range(N_BATCH)]
    sitems = [_item(100 + i) for i in range(N_STREAM)]
    bfuts = [None] * N_BATCH
    sresults: list = [None] * N_STREAM
    errors: list = []

    def batcher():
        for i, it in enumerate(bitems):
            bfuts[i] = srv.submit(it)

    def streamer(i):
        try:
            fut, prog = srv.submit_stream(sitems[i])
            if i % 3 == 2:  # every third stream is abandoned after 1 frame
                prog.wait_beyond(0, timeout=600)
                prog.cancel()
                sresults[i] = ("cancelled", None)
                return
            seen = 0
            toks = []
            while True:
                codes, n, done = prog.wait_beyond(seen, timeout=600)
                toks.extend(int(t) for t in codes[seen:n, 0])
                seen = n
                if done:
                    break
            out = fut.result(timeout=600)
            assert toks == [int(t) for t in out.codes[:, 0]], f"stream {i}"
            sresults[i] = ("done", out)
        except Exception as e:  # surface in the main thread
            errors.append((i, e))

    threads = [threading.Thread(target=batcher)] + [
        threading.Thread(target=streamer, args=(i,)) for i in range(N_STREAM)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    bouts = [f.result(timeout=600) for f in bfuts]
    srv.close()
    assert not errors, errors

    for i, (it, out) in enumerate(zip(bitems, bouts)):
        ref = _single(params, it)
        n = int(ref.n_frames)
        assert out.n_frames == n, f"batch {i}"
        np.testing.assert_array_equal(out.codes, np.asarray(ref.codes)[:n])
    for i, it in enumerate(sitems):
        kind, out = sresults[i]
        if kind == "cancelled":
            continue
        ref = _single(params, it)
        n = int(ref.n_frames)
        assert out.n_frames == n, f"stream {i}"
        np.testing.assert_array_equal(out.codes, np.asarray(ref.codes)[:n])
