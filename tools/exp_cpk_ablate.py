"""CP-kernel ablation: attribute the per-frame cost at a given batch size.

Times predict_codes_fused with the perf-diagnosis ``ablate`` switch
(ops/cp_kernel.py): full / nosample / nokvwrite / noattn / nomlp, each as
a fused 66-frame device loop (3-run mean after compile+warm). Outputs are
numerically WRONG under ablation — timing only.

Context: tools/microbench_batch.py measured the CP kernel at 1.83 ms/frame
at B=32 (vs 0.90 at B=1); candidate costs are the grouped attention's
64x wasted-FLOP score planes, the masked full-buffer KV writes
([2*B*NKV*SLOTS, D] rewrite per layer-position), and the batched
bisection top-k.

Usage: python tools/exp_cpk_ablate.py [B] [full nosample nokvwrite noattn nomlp]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from qwen3tts_tpu.models import generate as gen
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.cp_kernel import predict_codes_fused
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.utils import host_init as hi
from __graft_entry__ import _flagship_06b

FRAMES = 66


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    args = sys.argv[1:]
    B = int(args[0]) if args and args[0].isdigit() else 32
    which = [a for a in args if not a.isdigit()] or [
        "full", "nosample", "nokvwrite", "noattn", "nomlp"
    ]
    cfg = _flagship_06b()
    cpc = cfg.code_predictor_config
    h = cfg.hidden_size

    t0 = time.time()
    tp = hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16)
    cpp = hi.to_device(hi.host_init_cp_params(1, cpc, h), jnp.bfloat16)
    cpp = dict(cpp)
    cpp["layers"] = tk.fuse_layer_projections(cpp["layers"])
    cpp = quantize_decode_params_int8(cpp, "lm_head")
    jax.block_until_ready(cpp["norm"])
    log(f"B={B} param init: {time.time() - t0:.1f}s")

    def run(name):
        ablate = None if name == "full" else name

        @jax.jit
        def loop(cpp, tpp, hidden, key):
            def body(i, carry):
                code0, key, acc = carry
                key, kk = jax.random.split(key)
                codes, esum = predict_codes_fused(
                    cpp, cpc, tpp, hidden, code0, kk,
                    temperature=0.9, top_k=50, mode=gen._cpk_mode(),
                    ablate=ablate,
                )
                return codes[:, 0] % cfg.vocab_size, key, acc + esum.sum()

            c0 = jnp.zeros((B,), jnp.int32)
            _, _, acc = jax.lax.fori_loop(
                0, FRAMES, body, (c0, key, jnp.float32(0))
            )
            return acc

        hidden = jnp.zeros((B, h), jnp.bfloat16)
        t0 = time.time()
        y = loop(cpp, tp, hidden, jax.random.PRNGKey(4))
        jax.block_until_ready(y)
        compile_s = time.time() - t0
        t0 = time.time()
        n = 3
        for _ in range(n):
            y = loop(cpp, tp, hidden, jax.random.PRNGKey(4))
            jax.block_until_ready(y)
        dt = (time.time() - t0) / n
        log(f"{name:10s} x{FRAMES}: {dt * 1e3:7.1f} ms total, "
            f"{dt / FRAMES * 1e3:6.3f} ms/frame (compile {compile_s:.0f}s)")

    for name in which:
        run(name)


if __name__ == "__main__":
    main()
