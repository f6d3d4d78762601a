"""TPU validation of the fused CP kernel at flagship shapes:
numerics vs the XLA path (teacher-forced) + honest single-call timing.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from qwen3tts_tpu.models import code_predictor as cp
from qwen3tts_tpu.ops.cp_kernel import predict_codes_fused
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.utils import host_init as hi
from __graft_entry__ import _flagship_06b


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "wo_bf16"
    cfg = _flagship_06b()
    cpc = cfg.code_predictor_config
    t0 = time.time()
    tp = hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16)
    cpp = hi.to_device(hi.host_init_cp_params(1, cpc, cfg.hidden_size), jnp.bfloat16)
    cpp = quantize_decode_params_int8(cpp, "lm_head")
    jax.block_until_ready(cpp["norm"])
    log(f"param init: {time.time() - t0:.1f}s")

    hidden = (hi._rs(9, "h").standard_normal((1, cfg.hidden_size)) * 0.3).astype("float32")
    hidden = jnp.asarray(hidden, jnp.bfloat16)
    code0 = jnp.array([17], jnp.int32)

    # greedy kernel run with logits
    codes, esum, logits_k = predict_codes_fused(
        cpp, cpc, tp, hidden, code0, jax.random.PRNGKey(5),
        temperature=0.0, top_k=50, mode=mode, return_logits=True,
    )
    codes = np.asarray(codes)[0]
    logits_k = np.asarray(logits_k, np.float32)
    log(f"codes: {codes}")

    # XLA teacher-forced replay
    cache = cp.make_cp_cache(cpc, 1, jnp.bfloat16)
    c0e = cp._embed(tp["codec_embedding"], code0).astype(hidden.dtype)
    x0 = jnp.stack([hidden[0], c0e[0]], axis=0)[None]
    h, cache = cp.forward(cpp, cpc, x0, cache, jnp.int32(0))
    lx = [cp.head_logits(cpp, h[:, -1], 0)[0]]
    for idx in range(1, cpc.num_code_groups - 1):
        emb = cp._embed(
            cpp["codec_embedding"][idx - 1], jnp.asarray(codes[idx - 1 : idx])
        ).astype(hidden.dtype)
        h, cache = cp.forward(cpp, cpc, emb[:, None], cache, jnp.int32(idx + 1))
        lx.append(cp.head_logits(cpp, h[:, -1], idx)[0])
    logits_x = np.asarray(jnp.stack(lx), np.float32)
    scale = logits_x.std(axis=-1, keepdims=True) + 1e-6
    rel = np.abs(logits_k - logits_x) / scale
    agree = (logits_x.argmax(-1) == codes).mean()
    log(f"mode={mode}: max scaled logit diff {rel.max():.4f} "
        f"(per-step {np.round(rel.max(axis=1), 3)}), greedy argmax agree {agree:.2f}")

    # honest single-call timing (weights must cross HBM->VMEM every call)
    fn = jax.jit(lambda k: predict_codes_fused(
        cpp, cpc, tp, hidden, code0, k, temperature=0.9, top_k=50, mode=mode
    )[0])
    jax.block_until_ready(fn(jax.random.PRNGKey(0)))
    t0 = time.time()
    n = 20
    for i in range(n):
        y = fn(jax.random.PRNGKey(i))
        jax.block_until_ready(y)
    log(f"single-call (incl dispatch): {(time.time() - t0) / n * 1e3:.3f} ms")

    # sampled codes sanity under temperature
    cs, _ = predict_codes_fused(
        cpp, cpc, tp, hidden, code0, jax.random.PRNGKey(1),
        temperature=0.9, top_k=50, mode=mode,
    )
    cs2, _ = predict_codes_fused(
        cpp, cpc, tp, hidden, code0, jax.random.PRNGKey(2),
        temperature=0.9, top_k=50, mode=mode,
    )
    cs, cs2 = np.asarray(cs)[0], np.asarray(cs2)[0]
    log(f"sampled: {cs}")
    in_topk = [
        int(logits_k[j, cs[j]] >= np.sort(logits_k[j])[-50]) for j in range(15)
    ]
    log(f"sampled-in-top50 (vs greedy-run logits): {sum(in_topk)}/15, "
        f"keys differ: {(cs != cs2).any()}")


if __name__ == "__main__":
    main()
