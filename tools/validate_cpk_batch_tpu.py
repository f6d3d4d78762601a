"""Hardware validation: batched CP kernel vs batched XLA CP, greedy B=3.

Greedy codes from the fused kernel must match the XLA predict_codes path
row-for-row wherever the XLA top-2 logit gap clears bf16 noise; and the
batched kernel must equal three independent B=1 kernel runs exactly
(block-diagonality on the real chip).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from qwen3tts_tpu.models import code_predictor as cp
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.cp_kernel import predict_codes_fused
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.utils import host_init as hi
from __graft_entry__ import _flagship_06b


def log(*a):
    print(*a, flush=True)


cfg = _flagship_06b()
cpc = cfg.code_predictor_config
t0 = time.time()
tp = hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16)
cpp = hi.to_device(hi.host_init_cp_params(1, cpc, cfg.hidden_size), jnp.bfloat16)
cpp_f = dict(cpp)
cpp_f["layers"] = tk.fuse_layer_projections(cpp_f["layers"])
cpp_f = quantize_decode_params_int8(cpp_f, "lm_head")
cpp_u = quantize_decode_params_int8(cpp, "lm_head")
jax.block_until_ready(cpp_f["norm"])
log(f"init {time.time() - t0:.1f}s")

B = 3
hidden = (
    jax.random.normal(jax.random.PRNGKey(3), (B, cfg.hidden_size), jnp.float32)
    * 0.3
).astype(jnp.bfloat16)
code0 = jnp.array([17, 900, 5], jnp.int32)

kB, _ = jax.jit(
    lambda c, h, c0: predict_codes_fused(
        c, cpc, tp, h, c0, jax.random.PRNGKey(5),
        temperature=0.0, top_k=50, mode="wo_bf16",
    )
)(cpp_f, hidden, code0)
kB = np.asarray(kB)
log(f"batched kernel codes:\n{kB}")

# per-row B=1 kernel: must match exactly
ok_rows = True
for b in range(B):
    k1, _ = jax.jit(
        lambda c, h, c0: predict_codes_fused(
            c, cpc, tp, h, c0, jax.random.PRNGKey(5),
            temperature=0.0, top_k=50, mode="wo_bf16",
        )
    )(cpp_f, hidden[b : b + 1], code0[b : b + 1])
    if not (np.asarray(k1)[0] == kB[b]).all():
        ok_rows = False
        log(f"row {b} MISMATCH: {np.asarray(k1)[0]} vs {kB[b]}")
log(f"block-diagonality (B=1 rows == batched rows): {ok_rows}")

# batched XLA greedy (unfused layout): agreement modulo bf16-noise ties
xla = jax.jit(
    lambda c, h, c0: cp.predict_codes(
        c, cpc, tp, h, c0, jax.random.PRNGKey(5),
        temperature=0.0, top_k=50, top_p=1.0,
    )
)(cpp_u, hidden, code0)
xla = np.asarray(xla)
agree = (kB == xla).mean()
log(f"kernel-vs-XLA greedy agreement: {agree:.2%}")
log("OK" if ok_rows and agree > 0.8 else "MISMATCH")
