"""Per-frame decode cost split on the real chip: talker vs code-predictor
vs sampler. Mirrors bench.py's int8 serving config. Each component runs as
its own fused 66-iteration device loop so the split is apples-to-apples with
the production fused program.

Usage:  python tools/microbench.py [talker cp sampler full]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from qwen3tts_tpu.models import code_predictor as cp
from qwen3tts_tpu.models import generate as gen
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.sampling import build_suppress_mask, sample_token_inner
from qwen3tts_tpu.utils import host_init as hi
from __graft_entry__ import _flagship_06b

FRAMES = 66
PREFILL_LEN = 24


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    which = set(sys.argv[1:]) or {"talker", "cp", "sampler"}
    if "cpk" in which:
        return  # handled by bench_cpk below
    cfg = _flagship_06b()
    cpc = cfg.code_predictor_config

    t0 = time.time()
    tp = hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16)
    cpp = hi.to_device(hi.host_init_cp_params(1, cpc, cfg.hidden_size), jnp.bfloat16)
    from qwen3tts_tpu.ops.quant import quantize_decode_params_int8

    tp = dict(tp)
    tp["layers"] = tk.fuse_layer_projections(tp["layers"])
    tp = quantize_decode_params_int8(tp, "codec_head")
    cpp = quantize_decode_params_int8(cpp, "lm_head")
    jax.block_until_ready(tp["layers"]["input_layernorm"])
    log(f"param init: {time.time() - t0:.1f}s")

    cache_len = 256
    sampling = gen.SamplingConfig(0.9, 50, 1.0, 1.05, forbid_eos=True)
    suppress = build_suppress_mask(cfg.vocab_size, cfg.codec_eos_token_id)
    suppress = suppress.at[cfg.codec_eos_token_id].set(True)

    def timeit(name, fn, *args):
        y = fn(*args)
        jax.block_until_ready(y)
        t0 = time.time()
        n = 3
        for _ in range(n):
            y = fn(*args)
            jax.block_until_ready(y)
        dt = (time.time() - t0) / n
        log(f"{name}: {dt * 1e3:.1f} ms total, {dt / FRAMES * 1e3:.3f} ms/frame")
        return dt

    # ---- talker-only loop: step + codec head + 1 sample, no CP ----
    if "talker" in which:
        @jax.jit
        def talker_loop(params, cache, key):
            x0 = jnp.zeros((1, 1, cfg.hidden_size), jnp.bfloat16)

            def body(i, carry):
                x, cache, key, acc = carry
                key, kk = jax.random.split(key)
                h, cache = tk.forward(params, cfg, x, cache, jnp.int32(PREFILL_LEN) + i)
                logits = tk.codec_logits(params, h)[:, 0]
                code0 = sample_token_inner(
                    kk, logits, temperature=0.9, top_k=50, top_p=1.0,
                    repetition_penalty=1.05, seen=acc, suppress_mask=suppress,
                )
                acc = acc.at[code0[0]].set(True)
                x = tk.embed_codec(params, code0)[:, None].astype(jnp.bfloat16)
                return x, cache, key, acc

            seen = jnp.zeros((cfg.vocab_size,), bool)
            x, cache, key, seen = jax.lax.fori_loop(
                0, FRAMES, body, (x0, cache, key, seen)
            )
            return x

        cache = tk.make_cache(cfg, 1, cache_len, jnp.bfloat16)
        t0 = time.time()
        timeit("talker+head+sample x66", talker_loop, tp, cache, jax.random.PRNGKey(0))
        log(f"  (incl compile {time.time() - t0:.0f}s)")

    # ---- CP-only loop: 66 x predict_codes (15-step inner loop each) ----
    if "cp" in which:
        @jax.jit
        def cp_loop(cpp, tpp, hidden, key):
            def body(i, carry):
                code0, key, acc = carry
                key, kk = jax.random.split(key)
                rest = cp.predict_codes(
                    cpp, cpc, tpp, hidden, code0, kk,
                    temperature=0.9, top_k=50, top_p=1.0,
                )
                acc = acc + rest.sum()
                return (rest[:, 0] % cfg.vocab_size).astype(jnp.int32), key, acc

            code0 = jnp.zeros((1,), jnp.int32)
            _, _, acc = jax.lax.fori_loop(0, FRAMES, body, (code0, key, jnp.int32(0)))
            return acc

        hidden = jnp.zeros((1, cfg.hidden_size), jnp.bfloat16)
        t0 = time.time()
        timeit("cp predict_codes x66", cp_loop, cpp, tp, hidden, jax.random.PRNGKey(1))
        log(f"  (incl compile {time.time() - t0:.0f}s)")

    # ---- sampler-only: 66 x 16 samples on fixed logits ----
    if "sampler" in which:
        @jax.jit
        def sampler_loop(logits, key):
            def body(i, carry):
                key, acc = carry
                key, kk = jax.random.split(key)
                c = sample_token_inner(
                    kk, logits, temperature=0.9, top_k=50, top_p=1.0
                )
                return key, acc + c[0]

            key, acc = jax.lax.fori_loop(0, FRAMES * 16, body, (key, jnp.int32(0)))
            return acc

        logits = jnp.zeros((1, cpc.vocab_size), jnp.float32)
        t0 = time.time()
        timeit("sampler x66x16", sampler_loop, logits, jax.random.PRNGKey(2))
        log(f"  (incl compile {time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()


def bench_cpk(which):
    """Fused CP kernel timing at flagship shapes (appended, round 2)."""
    import time as _t
    from qwen3tts_tpu.ops.cp_kernel import predict_codes_fused, kernel_supported
    from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
    cfg = _flagship_06b()
    cpc = cfg.code_predictor_config
    t0 = _t.time()
    tp = hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16)
    cpp = hi.to_device(hi.host_init_cp_params(1, cpc, cfg.hidden_size), jnp.bfloat16)
    cpp = quantize_decode_params_int8(cpp, "lm_head")
    jax.block_until_ready(cpp["norm"])
    log(f"param init: {_t.time() - t0:.1f}s; supported={kernel_supported(cpp, cpc, cfg.hidden_size)}")
    hidden = jnp.zeros((1, cfg.hidden_size), jnp.bfloat16)

    for mode in which:
        @functools.partial(jax.jit, static_argnames=("mode",))
        def loop(cpp, tpp, hidden, key, mode):
            def body(i, carry):
                code0, key, acc = carry
                key, kk = jax.random.split(key)
                codes, esum = predict_codes_fused(
                    cpp, cpc, tpp, hidden, code0, kk,
                    temperature=0.9, top_k=50, mode=mode,
                )
                acc = acc + esum.sum()
                return codes[:, 0] % cfg.vocab_size, key, acc
            c0 = jnp.zeros((1,), jnp.int32)
            _, _, acc = jax.lax.fori_loop(0, FRAMES, body, (c0, jax.random.PRNGKey(0), jnp.float32(0)))
            return acc

        t0 = _t.time()
        try:
            y = loop(cpp, tp, hidden, jax.random.PRNGKey(1), mode)
            jax.block_until_ready(y)
        except Exception as e:
            log(f"cpk[{mode}] FAILED: {type(e).__name__}: {str(e)[:400]}")
            continue
        compile_s = _t.time() - t0
        t0 = _t.time()
        n = 3
        for _ in range(n):
            y = loop(cpp, tp, hidden, jax.random.PRNGKey(2), mode)
            jax.block_until_ready(y)
        dt = (_t.time() - t0) / n
        log(f"cpk[{mode}] x{FRAMES}: {dt*1e3:.1f} ms total, {dt/FRAMES*1e3:.3f} ms/frame (compile {compile_s:.0f}s)")


if __name__ == "__main__" and sys.argv[1:2] == ["cpk"]:
    bench_cpk(sys.argv[2:] or ["wo_bf16", "dyn_int8"])
