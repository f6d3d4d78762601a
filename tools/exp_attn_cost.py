"""Same-process probe: batched-attention cost vs streamed KV block count.

Runs generate_codes_batch at B with short prefill (offsets ~24-90, 1
streamed 128-row block) and long prefill (offsets ~280-346, 3 blocks) in
one process. The per-frame delta divided by the extra blocks separates
the two candidate cost models for the B=32 talker kernel:
  MXU tile-load bound: ~70 us/layer/block -> ~+3.9 ms/frame at +2 blocks
  HBM KV-stream bound: ~470 MB/block      -> ~+1.1 ms/frame at +2 blocks

Usage: python tools/exp_attn_cost.py [B]
"""

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

    def measure(tag, prefill_len):
        p_bucket = gen.pad_to_bucket(prefill_len)
        cache_len = -(-(p_bucket + FRAMES) // 128) * 128
        prefill = (
            jax.random.normal(
                jax.random.PRNGKey(3), (B, p_bucket, h), jnp.float32
            ) * 0.2
        ).astype(jnp.bfloat16)
        trailing = jnp.zeros((B, 16, h), jnp.bfloat16)

        def run(key):
            return bg.generate_codes_batch(
                tp, cpp, talker_cfg=cfg, cp_cfg=cpc, sampling=sampling,
                prefill_embeds=prefill,
                prefill_lens=jnp.full((B,), prefill_len, jnp.int32),
                trailing_embeds=trailing,
                trailing_lens=jnp.full((B,), 8, jnp.int32),
                tts_pad_embed=jnp.zeros((h,), jnp.bfloat16),
                cache=tk.make_cache(cfg, B, cache_len, jnp.bfloat16),
                max_steps=jnp.full((B,), FRAMES, jnp.int32),
                max_frames=FRAMES,
                key=key,
            )

        def sync(res):
            return int(jax.device_get(res.codes)[:, -1, 0].sum())

        t0 = time.time()
        sync(run(jax.random.PRNGKey(0)))
        log(f"  {tag} (cache {cache_len}): compile+first {time.time() - t0:.1f}s")
        times = []
        for i in range(4):
            t0 = time.time()
            sync(run(jax.random.PRNGKey(i + 1)))
            times.append(time.time() - t0)
        dt = sorted(times)[len(times) // 2]
        log(f"  {tag}: median {dt * 1e3:.0f} ms ({dt * 1e3 / FRAMES:.2f} ms/frame)"
            f"  runs={[f'{t*1e3:.0f}' for t in times]}")
        return dt

    short = measure("short prefill 24 (1 block)", 24)
    long_ = measure("long prefill 280 (3 blocks)", 280)
    d = (long_ - short) * 1e3 / FRAMES
    log(f"delta {d:.2f} ms/frame for +2 streamed blocks "
        f"({d / 2:.2f} ms/block; MXU-bound ~2.0, HBM-bound ~0.55)")


if __name__ == "__main__":
    main()
