"""Decisive top-k validation: top_k=1, no EOS bypass -> all draws == argmax."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp, numpy as np
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.ops.sampling import build_suppress_mask
from qwen3tts_tpu.utils import host_init as hi
from __graft_entry__ import _flagship_06b

def log(*a): print(*a, flush=True)

cfg = _flagship_06b()
t0 = time.time()
tp = hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16)
tp = dict(tp)
tp["layers"] = tk.fuse_layer_projections(tp["layers"])
tp = quantize_decode_params_int8(tp, "codec_head")
jax.block_until_ready(tp["layers"]["input_layernorm"])
log(f"init {time.time()-t0:.1f}s")

T, pos = 2176, 90
cache = tk.make_cache(cfg, 1, T, jnp.bfloat16)
H = cfg.hidden_size
pre = (jax.random.normal(jax.random.PRNGKey(3), (1, pos, H), jnp.float32) * 0.2).astype(jnp.bfloat16)
_, cache = tk.forward(tp, cfg, pre, cache, jnp.int32(0))
jax.block_until_ready(cache.k)
x = (jax.random.normal(jax.random.PRNGKey(5), (1, 1, H), jnp.float32) * 0.2).astype(jnp.bfloat16)

V = cfg.vocab_size
supp_add = jnp.where(build_suppress_mask(V, cfg.codec_eos_token_id),
                     jnp.float32(-1e30), jnp.float32(0.0))
seen = jnp.zeros((V,), bool)

@jax.jit
def greedy(tp_, cache_, x_):
    _, _, c = tk.forward_step_sample(
        tp_, cfg, x_, cache_, jnp.int32(pos), seen=seen, suppress_add=supp_add,
        seed=jnp.asarray([1, 2], jnp.int32), temperature=0.0, top_k=1,
        repetition_penalty=1.0, eos_token_id=None)
    return c[0]

@jax.jit
def draw_k1(tp_, cache_, x_, seed):
    _, _, c = tk.forward_step_sample(
        tp_, cfg, x_, cache_, jnp.int32(pos), seen=seen, suppress_add=supp_add,
        seed=seed, temperature=2.0, top_k=1,
        repetition_penalty=1.0, eos_token_id=None)
    return c[0]

g = int(greedy(tp, cache, x))
log(f"greedy(top_k=1): {g}")
codes = [int(draw_k1(tp, cache, x, jnp.asarray([i * 3 + 1, i + 11], jnp.int32)))
         for i in range(12)]
log(f"top_k=1 temp=2.0 draws: {sorted(set(codes))}")
log("OK" if all(c == g for c in codes) else "MISMATCH")
