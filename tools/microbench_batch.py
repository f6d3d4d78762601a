"""Per-frame cost split of the BATCHED decode at flagship int8 shapes.

Mirrors tools/bench_batch.py's configuration and splits one lockstep frame
into its serial components, each as its own fused 66-iteration device loop
(same methodology as tools/microbench.py for B=1):

  talker   — forward_batched_step (the talker megakernel at batch B)
  talker_s — forward_batched_step_sample: the PRODUCTION talker path
             (kernel + in-kernel sampler + per-sequence scatter append)
  scatter  — _scatter_append_batched alone (per-sequence KV scatter into
             the [L, B, Hkv, T, D] cache; XLA scatter in a loop carry)
  headsmp  — codec head + code0 sampler + seen update (the XLA variant)
  cpk      — predict_codes_fused at batch B (the CP megakernel)
  next     — _next_input_batch glue

Usage: python tools/microbench_batch.py [B] [talker talker_s scatter headsmp cpk next]

MEASUREMENT-ORDER WARNING (2026-08-20): the `scatter` case is order- and
process-state-dependent. Benched FIRST in a fresh process it measures
~0.002 ms/frame (the DUS chain aliases in place and the writes are
57 KB); benched AFTER the talker_s loop has run in the same process it
measures ~0.5 ms/frame. The production decode loop donates its carry, so
the in-place number is the real one — earlier frame-split claims that
attributed 0.5-1.0 ms to the scatter (r3 ROADMAP) were this artifact.
Same family as the carry-init artifact below and tools/exp_dus_cost3.py;
tools/exp_kv_append.py records the full diagnosis and the (no-win)
Pallas RMW alternative. To trust a `scatter` number, run it alone.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from qwen3tts_tpu.models import batch_generate as bg
from qwen3tts_tpu.models import generate as gen
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.ops.sampling import build_suppress_mask
from qwen3tts_tpu.utils import host_init as hi
from __graft_entry__ import _flagship_06b

import os

FRAMES = int(os.environ.get("MB_FRAMES", "66"))  # raise to validate timing
PREFILL_LEN = 24


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    args = sys.argv[1:]
    B = int(args[0]) if args and args[0].isdigit() else 32
    which = set(a for a in args if not a.isdigit()) or {
        "talker", "talker_s", "scatter", "headsmp", "cpk", "next"
    }
    cfg = _flagship_06b()
    cpc = cfg.code_predictor_config
    h = cfg.hidden_size

    t0 = time.time()
    tp = hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16)
    cpp = hi.to_device(hi.host_init_cp_params(1, cpc, h), jnp.bfloat16)
    tp = dict(tp)
    tp["layers"] = tk.fuse_layer_projections(tp["layers"])
    tp = quantize_decode_params_int8(tp, "codec_head")
    cpp = dict(cpp)
    cpp["layers"] = tk.fuse_layer_projections(cpp["layers"])
    cpp = quantize_decode_params_int8(cpp, "lm_head")
    jax.block_until_ready(cpp["norm"])
    log(f"B={B} param init: {time.time() - t0:.1f}s")

    sampling = gen.SamplingConfig(0.9, 50, 1.0, 1.05, forbid_eos=True)
    p_bucket = gen.pad_to_bucket(PREFILL_LEN)
    cache_len = -(-(p_bucket + FRAMES) // 128) * 128
    suppress = build_suppress_mask(cfg.vocab_size, cfg.codec_eos_token_id)
    suppress = suppress.at[cfg.codec_eos_token_id].set(True)
    offsets = jnp.full((B,), PREFILL_LEN, jnp.int32)

    def timeit(name, fn, *fargs):
        t0 = time.time()
        y = fn(*fargs)
        jax.block_until_ready(y)
        compile_s = time.time() - t0
        t0 = time.time()
        n = 3
        for _ in range(n):
            y = fn(*fargs)
            jax.block_until_ready(y)
        dt = (time.time() - t0) / n
        log(
            f"{name} x{FRAMES}: {dt * 1e3:.1f} ms total, "
            f"{dt / FRAMES * 1e3:.3f} ms/frame (compile {compile_s:.0f}s)"
        )
        return dt

    # NOTE (2026-08-18): every loop-varying carry below is initialized
    # from a jit ARGUMENT, never a closure/trace-time constant — a
    # constant-initialized offsets vector feeding dynamic_update_slice
    # starts degrades the whole chain to a full-buffer copy per iteration
    # (~0.65 ms/frame artifact; tools/exp_dus_cost3.py / /tmp lore).
    if "talker" in which:
        @jax.jit
        def talker_loop(params, cache, offs0):
            x0 = jnp.zeros((B, 1, h), jnp.bfloat16)

            def body(i, carry):
                x, cache, offs = carry
                hid, cache = tk.forward_batched_step(params, cfg, x, cache, offs)
                return hid.astype(jnp.bfloat16), cache, offs + 1

            x, _, _ = jax.lax.fori_loop(0, FRAMES, body, (x0, cache, offs0))
            return x

        cache = tk.make_cache(cfg, B, cache_len, jnp.bfloat16)
        timeit("talker step", talker_loop, tp, cache, offsets)

    if "talker_s" in which:
        suppress_add = jnp.where(suppress, jnp.float32(-1e30), jnp.float32(0.0))

        @jax.jit
        def talker_s_loop(params, cache, offs0):
            x0 = jnp.zeros((B, 1, h), jnp.bfloat16)
            seen = jnp.zeros((B, cfg.vocab_size), bool)
            seed = jnp.array([7, 11], jnp.int32)

            def body(i, carry):
                x, cache, offs = carry
                hid, cache, code0 = tk.forward_batched_step_sample(
                    params, cfg, x, cache, offs,
                    seen=seen, suppress_add=suppress_add, seed=seed,
                    temperature=0.9, top_k=50, repetition_penalty=1.05,
                    eos_token_id=None,
                )
                return (
                    (hid + code0[:, None, None]).astype(jnp.bfloat16),
                    cache, offs + 1,
                )

            x, cache, _ = jax.lax.fori_loop(0, FRAMES, body, (x0, cache, offs0))
            return x

        cache = tk.make_cache(cfg, B, cache_len, jnp.bfloat16)
        timeit("talker step+sample+scatter (production)", talker_s_loop, tp, cache,
               offsets)

    if "scatter" in which:
        @jax.jit
        def scatter_loop(cache, k_new, v_new, offs0):
            def body(i, carry):
                cache, offs = carry
                cache = tk._scatter_append_batched(cache, cfg, k_new, v_new, offs)
                return cache, offs + 1

            cache, _ = jax.lax.fori_loop(0, FRAMES, body, (cache, offs0))
            # read BOTH buffers so neither update chain is dead code
            return cache.k[0, 0, 0, 0, 0] + cache.v[0, 0, 0, 0, 0]

        cache = tk.make_cache(cfg, B, cache_len, jnp.bfloat16)
        kv_shape = (cfg.num_hidden_layers, B, cfg.num_key_value_heads, cfg.head_dim)
        timeit(
            "kv scatter append", scatter_loop, cache,
            jnp.ones(kv_shape, jnp.bfloat16), jnp.ones(kv_shape, jnp.bfloat16),
            offsets,
        )

    if "headsmp" in which:
        @jax.jit
        def headsmp_loop(params, hidden, key):
            def body(i, carry):
                key, seen, acc = carry
                key, kk = jax.random.split(key)
                logits = tk.codec_logits(params, hidden)[:, 0]
                code0 = bg._sample_batch(
                    kk, logits, sampling, seen, suppress, cfg.codec_eos_token_id
                )
                seen = seen.at[jnp.arange(B), code0].set(True)
                return key, seen, acc + code0.sum()

            seen = jnp.zeros((B, cfg.vocab_size), bool)
            _, _, acc = jax.lax.fori_loop(
                0, FRAMES, body, (jax.random.PRNGKey(0), seen, jnp.int32(0))
            )
            return acc

        hidden = jnp.zeros((B, 1, h), jnp.bfloat16)
        timeit("codec head + sample + seen", headsmp_loop, tp, hidden, jax.random.PRNGKey(3))

    if "cpk" in which:
        from qwen3tts_tpu.ops.cp_kernel import predict_codes_fused

        @jax.jit
        def cpk_loop(cpp, tpp, hidden, key, c0):
            def body(i, carry):
                code0, key, acc = carry
                key, kk = jax.random.split(key)
                codes, esum = predict_codes_fused(
                    cpp, cpc, tpp, hidden, code0, kk,
                    temperature=0.9, top_k=50, mode=gen._cpk_mode(),
                )
                return codes[:, 0] % cfg.vocab_size, key, acc + esum.sum()

            _, _, acc = jax.lax.fori_loop(
                0, FRAMES, body, (c0, key, jnp.float32(0))
            )
            return acc

        hidden = jnp.zeros((B, h), jnp.bfloat16)
        timeit("cp kernel", cpk_loop, cpp, tp, hidden, jax.random.PRNGKey(4),
               jnp.zeros((B,), jnp.int32))

    if "next" in which:
        trailing = jnp.zeros((B, 16, h), jnp.bfloat16)
        trailing_lens = jnp.full((B,), 8, jnp.int32)
        tts_pad = jnp.zeros((h,), jnp.bfloat16)

        @jax.jit
        def next_loop(cpp, tpp, code0, rest, trailing, trailing_lens, tts_pad,
                      steps0, csum):
            def body(i, carry):
                acc, c0, steps = carry
                x = bg._next_input_batch(
                    cpp, tpp, trailing, trailing_lens, tts_pad,
                    steps, c0, rest, csum,
                )
                return acc + x.sum().astype(jnp.float32), (c0 + 1) % 100, steps + 1

            acc, _, _ = jax.lax.fori_loop(
                0, FRAMES, body, (jnp.float32(0), code0, steps0)
            )
            return acc

        timeit(
            "next-input glue", next_loop, cpp, tp,
            jnp.zeros((B,), jnp.int32), jnp.zeros((B, 15), jnp.int32),
            trailing, trailing_lens, tts_pad,
            jnp.full((B,), 3, jnp.int32), jnp.zeros((B, h), jnp.float32),
        )


if __name__ == "__main__":
    main()
