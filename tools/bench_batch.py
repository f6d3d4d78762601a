"""End-to-end batched serving throughput at flagship int8 shapes.

Runs ``generate_codes_batch`` (B sequences, lockstep, fused CP kernel when
eligible) for a fixed 66 frames per sequence and reports codec tokens/s.
This is the reproducible source of the batch-throughput number quoted in
README.md (the reference is batch-1 — no counterpart exists there).

Usage: python tools/bench_batch.py [B] [--bf16] [--no-cpk] [--kv-int8]
"""

from __future__ import annotations

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
    print(*a, file=sys.stderr, flush=True)


def main():
    B = int(sys.argv[1]) if sys.argv[1:] and sys.argv[1].isdigit() else 8
    bf16 = "--bf16" in sys.argv
    kv_int8 = "--kv-int8" in sys.argv
    if "--no-cpk" in sys.argv:
        os.environ["QWEN3TTS_NO_CP_KERNEL"] = "1"
    cfg = _flagship_06b()
    cpc = cfg.code_predictor_config
    h = cfg.hidden_size

    t0 = time.time()
    tp = hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16)
    cpp = hi.to_device(hi.host_init_cp_params(1, cpc, h), jnp.bfloat16)
    if not bf16:
        # both fused: the batched talker megakernel and the batched CP
        # kernel need the fused serving layout (mirrors from_pretrained)
        tp = dict(tp)
        tp["layers"] = tk.fuse_layer_projections(tp["layers"])
        cpp = dict(cpp)
        cpp["layers"] = tk.fuse_layer_projections(cpp["layers"])
        tp = quantize_decode_params_int8(tp, "codec_head")
        cpp = quantize_decode_params_int8(cpp, "lm_head")
    jax.block_until_ready(cpp["norm"])
    log(f"B={B} init {time.time() - t0:.1f}s ({'bf16' if bf16 else 'int8'}{' +kv-int8' if kv_int8 else ''})")

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
            cache=tk.make_cache(cfg, B, cache_len, jnp.bfloat16, quantized=kv_int8),
            max_steps=jnp.full((B,), FRAMES, jnp.int32),
            max_frames=FRAMES,
            key=key,
        )

    def sync(res):
        # device->host transfer: the only sync the axon tunnel can't elide
        # (block_until_ready has been observed returning while batched
        # frames were still in flight — see tools/ab_tks_batch.py)
        return int(jax.device_get(res.codes)[:, -1, 0].sum())

    t0 = time.time()
    res = run(jax.random.PRNGKey(0))
    sync(res)
    log(f"compile+first run {time.time() - t0:.1f}s, frames={res.n_frames}")

    n = 3
    t0 = time.time()
    for i in range(n):
        res = run(jax.random.PRNGKey(i + 1))
        sync(res)
    dt = (time.time() - t0) / n
    toks = B * 16 * FRAMES
    per_seq_audio = FRAMES / 12.5
    log(
        f"batch decode: {dt * 1e3:.0f} ms for {toks} codec tokens -> "
        f"{toks / dt:.0f} tok/s/chip, per-seq RTF {dt / per_seq_audio:.3f}"
    )
    print(
        '{"metric": "batch%d_codec_tok_s_0.6b_%s%s", "value": %.0f, '
        '"unit": "codec_tok_per_s_per_chip"}'
        % (B, "bf16" if bf16 else "int8", "_kvint8" if kv_int8 else "", toks / dt)
    )


if __name__ == "__main__":
    main()
