"""Same-process A/B: batched decode with vs without the in-kernel sampler.

Runs generate_codes_batch twice in ONE process (same chip state, same
synthetic weights): variant A = fused step kernel + XLA head/sampler
(QWEN3TTS_NO_SAMPLE_KERNEL=1), variant B = in-kernel row-parallel
sampler. jit caches are cleared between variants because the env knob is
read at trace time, not part of the cache key.

Usage: python tools/ab_tks_batch.py [B]
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from qwen3tts_tpu.models import batch_generate as bg
from qwen3tts_tpu.models import generate as gen
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.utils import host_init as hi
from __graft_entry__ import _flagship_06b

FRAMES = 66
PREFILL_LEN = 24


def log(*a):
    print(*a, flush=True)


def main():
    B = int(sys.argv[1]) if sys.argv[1:] else 32
    cfg = _flagship_06b()
    cpc = cfg.code_predictor_config
    h = cfg.hidden_size

    t0 = time.time()
    tp = hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16)
    cpp = hi.to_device(hi.host_init_cp_params(1, cpc, h), jnp.bfloat16)
    tp = dict(tp)
    tp["layers"] = tk.fuse_layer_projections(tp["layers"])
    cpp = dict(cpp)
    cpp["layers"] = tk.fuse_layer_projections(cpp["layers"])
    tp = quantize_decode_params_int8(tp, "codec_head")
    cpp = quantize_decode_params_int8(cpp, "lm_head")
    jax.block_until_ready(cpp["norm"])
    log(f"B={B} init {time.time() - t0:.1f}s")

    sampling = gen.SamplingConfig(0.9, 50, 1.0, 1.05, forbid_eos=True)
    p_bucket = gen.pad_to_bucket(PREFILL_LEN)
    cache_len = -(-(p_bucket + FRAMES) // 128) * 128
    prefill = (
        jax.random.normal(jax.random.PRNGKey(3), (B, p_bucket, h), jnp.float32)
        * 0.2
    ).astype(jnp.bfloat16)
    trailing = jnp.zeros((B, 16, h), jnp.bfloat16)

    def run(key):
        return bg.generate_codes_batch(
            tp, cpp, talker_cfg=cfg, cp_cfg=cpc, sampling=sampling,
            prefill_embeds=prefill,
            prefill_lens=jnp.full((B,), PREFILL_LEN, jnp.int32),
            trailing_embeds=trailing,
            trailing_lens=jnp.full((B,), 8, jnp.int32),
            tts_pad_embed=jnp.zeros((h,), jnp.bfloat16),
            cache=tk.make_cache(cfg, B, cache_len, jnp.bfloat16),
            max_steps=jnp.full((B,), FRAMES, jnp.int32),
            max_frames=FRAMES,
            key=key,
        )

    def sync(res):
        # device->host transfer: the only sync the axon tunnel can't elide
        # (block_until_ready returned in ~1 ms while 66 batched frames were
        # still in flight — measured impossible 8.8M tok/s)
        return int(jax.device_get(res.codes)[:, -1, 0].sum())

    def measure(tag):
        t0 = time.time()
        res = run(jax.random.PRNGKey(0))
        chk = sync(res)
        log(f"  {tag}: compile+first {time.time() - t0:.1f}s chk={chk}")
        n = 4
        times = []
        for i in range(n):
            t0 = time.time()
            res = run(jax.random.PRNGKey(i + 1))
            chk = sync(res)
            times.append(time.time() - t0)
            log(f"  {tag}: run {i}: {times[-1] * 1e3:.0f} ms chk={chk}")
        dt = sorted(times)[len(times) // 2]
        toks = B * 16 * FRAMES
        log(f"  {tag}: median {dt * 1e3:.0f} ms -> {toks / dt:.0f} tok/s "
            f"({dt * 1e3 / FRAMES:.2f} ms/frame)")
        return toks / dt

    os.environ["QWEN3TTS_NO_SAMPLE_KERNEL"] = "1"
    a = measure("A xla-sampler")
    bg.prefill_start_batch.clear_cache()
    bg.generate_chunk_batch.clear_cache()
    del os.environ["QWEN3TTS_NO_SAMPLE_KERNEL"]
    b = measure("B in-kernel sampler")
    log(f"A={a:.0f} B={b:.0f} tok/s -> in-kernel is {b / a:.3f}x")


if __name__ == "__main__":
    main()
