"""1.7B vd/clone margin: where does the 66-frame e2e time go?

Round-4 verdict #4: VoiceDesign p50/p95 RTF 0.0885/0.0959 and clone 0.0942
sit <10% under the 0.1 line. The bench's vd_run is NOT the production path:
it reuses the long-decode program (cache_len 4096) and vocodes 66 frames
through a separate 128-bucket dispatch, while production generate() runs
tts._generate_and_decode — fused decode+vocoder, 72-bucket lax.switch,
right-sized cache. This measures the pieces on the real chip:

  A  bench vd_run today: run_17b(cache 4096) + separate 128-bucket vocode
  B  split gen with a right-sized cache (cache_len 256)       [gen effect]
  C  separate vocode at the 72 bucket                         [voc effect]
  D  production fused _generate_and_decode (cache 256, max_frames 128)

Usage: python tools/exp_17b_margin.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_17b
from qwen3tts_tpu.config import TokenizerDecoderConfig
from qwen3tts_tpu.models import generate as gen
from qwen3tts_tpu.models import vocoder as vc

FRAMES = 66
PREFILL_LEN = 24
CODEC_RATE = 12.5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


import numpy as _np

_sum = jax.jit(lambda a: a.astype(jnp.float32).sum())


def _sync(x):
    """Scalar-readback sync: block_until_ready returns EARLY on the axon
    tunnel (see tools/ab_tks_batch.py) — a device_get of a reduced scalar
    is the only reliable completion barrier."""
    return float(_np.asarray(_sum(x)))


def timeit(fn, *args, n=5, warm=1):
    for _ in range(warm):
        _sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        _sync(fn(*args))
        ts.append(time.time() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    from bench import make_decode_params

    cfg = _flagship_17b()
    cpc = cfg.code_predictor_config
    vcfg = TokenizerDecoderConfig()
    t0 = time.time()
    tp, cpp = make_decode_params(cfg, cpc, seeds=(30, 31))
    voc = jax.jit(lambda k: vc.init_vocoder_params(k, vcfg, jnp.float32))(
        jax.random.PRNGKey(2)
    )
    jax.block_until_ready(jax.tree.leaves(voc)[0])
    log(f"param init {time.time() - t0:.0f}s")

    h = cfg.hidden_size
    p_bucket = 64
    prefill = jax.random.normal(
        jax.random.PRNGKey(33), (1, p_bucket, h), jnp.bfloat16) * 0.05
    trailing = jax.random.normal(
        jax.random.PRNGKey(34), (64, h), jnp.bfloat16) * 0.05
    pad = jnp.zeros((h,), jnp.bfloat16)
    sampling = gen.SamplingConfig(0.9, 50, 1.0, 1.05, forbid_eos=True)
    audio_s = FRAMES / CODEC_RATE

    def run_gen(cache_len, max_frames, seed):
        return gen.generate_codes_fused(
            tp, cpp, talker_cfg=cfg, cp_cfg=cpc, sampling=sampling,
            prefill_embeds=prefill, prefill_len=jnp.int32(PREFILL_LEN),
            trailing_embeds=trailing, trailing_len=jnp.int32(12),
            tts_pad_embed=pad, cache_len=cache_len,
            max_steps=jnp.int32(FRAMES), max_frames=max_frames,
            key=jax.random.PRNGKey(seed),
        )

    # ---- A: today's bench path (cache 4096, vocode at 128) ----
    t0 = time.time()
    cA = run_gen(4096, 512, 0)
    _sync(cA.codes)
    log(f"gen(4096) compile {time.time() - t0:.0f}s")
    gA, gA50 = timeit(lambda s: run_gen(4096, 512, s).codes, 1)
    buf128 = jnp.zeros((1, 128, 16), jnp.int32).at[0, :FRAMES].set(
        cA.codes[:FRAMES])
    v128, _ = timeit(
        lambda: vc.decode(voc, vcfg, buf128, jnp.int32(FRAMES))[0])
    log(f"A gen(cache4096) {gA*1e3:.1f} ms (p50 {gA50*1e3:.1f})  "
        f"voc128 {v128*1e3:.1f} ms  -> RTF {(gA50+v128)/audio_s:.4f}")

    # ---- B: right-sized cache ----
    t0 = time.time()
    cB = run_gen(256, 128, 0)
    _sync(cB.codes)
    log(f"gen(256) compile {time.time() - t0:.0f}s")
    gB, gB50 = timeit(lambda s: run_gen(256, 128, s).codes, 1)
    log(f"B gen(cache256)  {gB*1e3:.1f} ms (p50 {gB50*1e3:.1f})  "
        f"delta vs A: {(gA50-gB50)*1e3:+.1f} ms")

    # ---- C: 72-bucket vocode ----
    buf72 = jnp.zeros((1, 72, 16), jnp.int32).at[0, :FRAMES].set(
        cA.codes[:FRAMES])
    v72, _ = timeit(lambda: vc.decode(voc, vcfg, buf72, jnp.int32(FRAMES))[0])
    log(f"C voc72 {v72*1e3:.1f} ms  delta vs 128: {(v128-v72)*1e3:+.1f} ms")

    # ---- D: production fused path ----
    from qwen3tts_tpu.tts import _generate_and_decode

    def run_fused(seed):
        return _generate_and_decode(
            tp, cpp, voc, talker_cfg=cfg, cp_cfg=cpc, sampling=sampling,
            dec_cfg=vcfg, prefill_embeds=prefill,
            prefill_len=jnp.int32(PREFILL_LEN), trailing_embeds=trailing,
            trailing_len=jnp.int32(12), tts_pad_embed=pad, cache_len=256,
            max_steps=jnp.int32(FRAMES), max_frames=128,
            key=jnp.asarray(jax.random.PRNGKey(seed)),
        )

    t0 = time.time()
    out = run_fused(0)
    _sync(out[2])
    log(f"fused compile {time.time() - t0:.0f}s")
    dts = []
    for i in range(12):
        t0 = time.time()
        _sync(run_fused(40 + i)[2])
        dts.append(time.time() - t0)
    dts.sort()
    p50, p95 = dts[len(dts) // 2], dts[-1]
    log(f"D fused e2e p50 {p50*1e3:.1f} ms p95 {p95*1e3:.1f} ms  "
        f"-> RTF p50 {p50/audio_s:.4f} p95 {p95/audio_s:.4f}")
    print({
        "A_rtf": round((gA50 + v128) / audio_s, 4),
        "B_gen_ms": round(gB50 * 1e3, 1),
        "C_voc72_ms": round(v72 * 1e3, 1),
        "D_rtf_p50": round(p50 / audio_s, 4),
        "D_rtf_p95": round(p95 / audio_s, 4),
    })


if __name__ == "__main__":
    main()
