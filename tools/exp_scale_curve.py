"""Serving scale curve: lockstep batch sweep at flagship int8 shapes.

Round-4 verdict #9: SCALING.md claimed "nearly flat until KV streaming
dominates" without a measured knee. This sweeps B with one shared param
init and prints one JSON line per config:

  - B in {8, 16, 32, 48, 64} at the bench-standard short cache (128 slots,
    bf16 KV) — the headline-comparable curve;
  - B in {8, 16, 32, 48, 64} at a realistic long cache (512 slots, int8
    KV) — where batched attention's KV streaming can dominate and the
    knee should appear.

66 frames/seq, forbid_eos, fused int8 megakernels (the serving config).
Output feeds the SCALING.md curve table (tools/update_perf_docs.py reads
the saved JSON lines from exp_scale_curve.json).

Usage: python tools/exp_scale_curve.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_06b
from qwen3tts_tpu.models import batch_generate as bg
from qwen3tts_tpu.models import generate as gen
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.utils import host_init as hi

FRAMES = 66
PREFILL_LEN = 24
BATCHES = (8, 16, 32, 48, 64)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    args = [a for a in sys.argv[1:]]
    only = None
    if "--bs" in args:
        i = args.index("--bs")
        only = tuple(int(b) for b in args[i + 1].split(","))
        del args[i:i + 2]
    skip_short = "--skip-short" in args
    args = [a for a in args if a != "--skip-short"]
    out_path = args[0] if args else "exp_scale_curve.json"
    cfg = _flagship_06b()
    cpc = cfg.code_predictor_config
    h = cfg.hidden_size

    t0 = time.time()
    tp = dict(hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16))
    cpp = dict(hi.to_device(hi.host_init_cp_params(1, cpc, h), jnp.bfloat16))
    tp["layers"] = tk.fuse_layer_projections(tp["layers"])
    cpp["layers"] = tk.fuse_layer_projections(cpp["layers"])
    tp = quantize_decode_params_int8(tp, "codec_head")
    cpp = quantize_decode_params_int8(cpp, "lm_head")
    jax.block_until_ready(cpp["norm"])
    log(f"init {time.time() - t0:.1f}s")

    sampling = gen.SamplingConfig(0.9, 50, 1.0, 1.05, forbid_eos=True)
    results = []

    def measure(B, cache_len, kv_int8):
        prefill = (
            jax.random.normal(jax.random.PRNGKey(3), (B, 64, h), jnp.float32)
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
                cache=tk.make_cache(
                    cfg, B, cache_len, jnp.bfloat16, quantized=kv_int8
                ),
                max_steps=jnp.full((B,), FRAMES, jnp.int32),
                max_frames=FRAMES,
                key=key,
            )

        def sync(res):
            return int(jax.device_get(res.codes)[:, -1, 0].sum())

        t0 = time.time()
        sync(run(jax.random.PRNGKey(0)))
        compile_s = time.time() - t0
        n = 3
        t0 = time.time()
        for i in range(n):
            sync(run(jax.random.PRNGKey(i + 1)))
        dt = (time.time() - t0) / n
        toks = B * 16 * FRAMES
        row = {
            "B": B, "cache_len": cache_len,
            "kv": "int8" if kv_int8 else "bf16",
            "tok_s": round(toks / dt),
            "ms_per_frame": round(dt / FRAMES * 1e3, 2),
            "per_seq_rtf": round(dt / (FRAMES / 12.5), 4),
        }
        results.append(row)
        log(f"B={B:3d} cache={cache_len} kv={row['kv']}: "
            f"{row['tok_s']} tok/s, {row['ms_per_frame']} ms/frame "
            f"(compile {compile_s:.0f}s)")

    batches = only or BATCHES
    if not skip_short:
        for B in batches:
            measure(B, 128, False)
    for B in batches:
        measure(B, 512, True)

    # merge with an existing record (reruns of a subset keep other rows)
    if os.path.exists(out_path):
        with open(out_path) as f:
            old = json.load(f).get("rows", [])
        keyed = {(r["B"], r["cache_len"], r["kv"]): r for r in old}
        keyed.update({(r["B"], r["cache_len"], r["kv"]): r for r in results})
        results = sorted(
            keyed.values(), key=lambda r: (r["cache_len"], r["kv"], r["B"])
        )
    with open(out_path, "w") as f:
        json.dump({"frames": FRAMES, "rows": results}, f, indent=1)
    log(f"wrote {out_path}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
