"""Decompose the B=1 fused decode frame: talker kernel + CP kernel + glue.

Round-4 verdict #3: "merge the talker and CP kernels — or refute with a
measurement." The r3 split was talker 1.28 + CP 0.90 + glue ~0.2 ms/frame;
tools/exp_op_overhead.py shows tiny-op overhead on this chip is ~0 us, so
the glue must live in specific ops or in the inter-kernel handoff. This
times on-device fori_loops of the REAL frame body with the glue pieces
added back one at a time (0.6B int8 serving config, cache_len 256,
matching bench.py's headline scenario):

  A   talker kernel only (forward_step_sample, self-fed input)
  B   A + CP kernel, minimal handoff: next input = (embed(code0)+esum)
  C   B + codes/tokens record (two dynamic_update_slice rows)
  D   C + seen scatter + trailing one-hot select  == full glue, no cond
  E   production body (models/generate.py generate_chunk, forbid_eos)

E-D = the lax.cond around the CP kernel (+ key plumbing differences);
D-B = record/seen/trailing glue; B-A = CP kernel + embed-handoff.

Usage: python tools/exp_glue.py  [N_FRAMES=198]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_06b
from qwen3tts_tpu.models import generate as gen
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.cp_kernel import predict_codes_fused
from qwen3tts_tpu.ops.sampling import build_suppress_mask

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 198
CACHE_LEN = 256
PREFILL = 24


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bench import make_decode_params

    cfg = _flagship_06b()
    cpc = cfg.code_predictor_config
    tp, cpp = make_decode_params(cfg, cpc)
    h = cfg.hidden_size
    eos = cfg.codec_eos_token_id
    supp = build_suppress_mask(cfg.vocab_size, eos).at[eos].set(True)
    suppress_add = jnp.where(supp, jnp.float32(-1e30), jnp.float32(0.0))
    trailing = jax.random.normal(jax.random.PRNGKey(4), (64, h), jnp.bfloat16) * 0.05
    tts_pad = jnp.zeros((h,), jnp.bfloat16)

    @jax.jit
    def _prefill(tp_):
        cache = tk.make_cache(cfg, 1, CACHE_LEN, jnp.bfloat16)
        x = jax.random.normal(
            jax.random.PRNGKey(3), (1, 64, h), jnp.bfloat16) * 0.05
        _, cache = tk.forward(tp_, cfg, x, cache, jnp.int32(0))
        return cache

    def prefill_cache():
        return _prefill(tp)

    def body_level(level: str):
        """One decode frame at glue level A/B/C/D (see module docstring).

        Params flow in as jit ARGUMENTS (closure capture would bake them
        into the HLO as literals — a 600 MB remote_compile body, HTTP 413
        on the tunnel)."""

        def frame(tp, cpp, i, carry):
            cur, cache, offset, seen, codes, tokens = carry
            st = i.astype(jnp.int32)
            seed_tok = jnp.stack(
                [st * jnp.int32(-1640531527), st * jnp.int32(-2048144789)]
            )
            k_cp = jnp.stack(
                [st ^ jnp.int32(-1028477387), st * jnp.int32(668265263)]
            )
            hidden_last, cache, code0 = tk.forward_step_sample(
                tp, cfg, cur, cache, offset,
                seen=seen, suppress_add=suppress_add, seed=seed_tok,
                temperature=0.9, top_k=50, repetition_penalty=1.05,
                eos_token_id=None,
            )
            if level == "A":
                nxt = hidden_last.astype(jnp.bfloat16) * 0.01
                rest = None
            else:
                rest, esum = predict_codes_fused(
                    cpp, cpc, tp, hidden_last[:, 0], code0, k_cp,
                    temperature=0.9, top_k=50, mode="wo_bf16",
                )
                codec_sum = tk.embed_codec(tp, code0).astype(jnp.float32) + esum
                nxt = codec_sum[:, None].astype(jnp.bfloat16)
            if level in ("C", "D"):
                row = jnp.concatenate([code0[:1], rest[0]], axis=0)
                codes = codes.at[st].set(row)
                tokens = tokens.at[st].set(code0[0])
            if level == "D":
                seen = seen.at[code0[0]].set(True)
                text = jnp.where(
                    st < 12,
                    trailing[jnp.minimum(st, trailing.shape[0] - 1)],
                    tts_pad,
                )
                nxt = (text[None] + codec_sum.astype(text.dtype))[:, None]
            return cur * 0 + nxt, cache, offset + 1, seen, codes, tokens

        @jax.jit
        def run(tp_, cpp_, cache):
            import functools as _ft

            carry = (
                jnp.zeros((1, 1, h), jnp.bfloat16),
                cache,
                jnp.int32(PREFILL),
                jnp.zeros((cfg.vocab_size,), bool),
                jnp.zeros((128, cfg.num_code_groups), jnp.int32),
                jnp.zeros((128,), jnp.int32),
            )
            out = jax.lax.fori_loop(
                0, FRAMES, _ft.partial(frame, tp_, cpp_), carry
            )
            # return the live next-input too: at levels A/B codes/seen stay
            # constant and XLA would otherwise DCE the whole loop
            return out[0], out[4], out[3]

        return run

    results = {}
    cache0 = prefill_cache()
    jax.block_until_ready(cache0.k)
    for level in ("A", "B", "C", "D"):
        run = body_level(level)
        t0 = time.time()
        out = run(tp, cpp, cache0)
        jax.block_until_ready(out[0])
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            out = run(tp, cpp, cache0)
            jax.block_until_ready(out[0])
            times.append(time.time() - t0)
        per_frame = min(times) / FRAMES * 1e3
        results[level] = per_frame
        log(f"level {level}: {per_frame:7.3f} ms/frame "
            f"(best of 3, compile {compile_s:.0f}s)")

    # E: the production chunk body (prefill + chunk as in bench)
    sampling = gen.SamplingConfig(0.9, 50, 1.0, 1.05, forbid_eos=True)

    def run_prod(seed):
        return gen.generate_codes_fused(
            tp, cpp, talker_cfg=cfg, cp_cfg=cpc, sampling=sampling,
            prefill_embeds=jax.random.normal(
                jax.random.PRNGKey(3), (1, 64, h), jnp.bfloat16) * 0.05,
            prefill_len=jnp.int32(PREFILL),
            trailing_embeds=trailing, trailing_len=jnp.int32(12),
            tts_pad_embed=tts_pad, cache_len=CACHE_LEN,
            max_steps=jnp.int32(FRAMES), max_frames=FRAMES,
            key=jax.random.PRNGKey(seed),
        )

    out = run_prod(0)
    jax.block_until_ready(out.codes)
    times = []
    for i in range(3):
        t0 = time.time()
        out = run_prod(i + 1)
        jax.block_until_ready(out.codes)
        times.append(time.time() - t0)
    # subtract nothing: prefill ~64 tokens is <2% of 198 frames
    results["E"] = min(times) / FRAMES * 1e3
    log(f"level E: {results['E']:7.3f} ms/frame (production fused loop)")

    log("\n-- deltas --")
    log(f"CP kernel + embed handoff (B-A): {results['B']-results['A']:+.3f} ms")
    log(f"record DUS x2            (C-B): {results['C']-results['B']:+.3f} ms")
    log(f"seen scatter + trailing  (D-C): {results['D']-results['C']:+.3f} ms")
    log(f"cond + prod key plumbing (E-D): {results['E']-results['D']:+.3f} ms")
    print({k: round(v, 4) for k, v in results.items()})


if __name__ == "__main__":
    main()
