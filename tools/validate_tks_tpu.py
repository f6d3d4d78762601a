"""Flagship-shape validation of the sample-mode talker kernel on TPU."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp, numpy as np
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.ops.sampling import build_suppress_mask, sample_token_inner
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
eos = cfg.codec_eos_token_id
supp = build_suppress_mask(V, eos)
seen = jnp.zeros((V,), bool).at[123].set(True)
supp_add = jnp.where(supp, jnp.float32(-1e30), jnp.float32(0.0))

# greedy via fused kernel
t0 = time.time()
h_k, cache_k, code_k = tk.forward_step_sample(
    tp, cfg, x, cache, jnp.int32(pos), seen=seen, suppress_add=supp_add,
    seed=jnp.asarray([7, 13], jnp.int32), temperature=0.0, top_k=50,
    repetition_penalty=1.05, eos_token_id=eos)
jax.block_until_ready(h_k)
log(f"kernel greedy compile+run {time.time()-t0:.1f}s -> code {int(code_k[0])}")

# XLA reference
import os
os.environ["QWEN3TTS_NO_TALKER_KERNEL"] = "1"
h_x, _ = tk.forward(tp, cfg, x, cache, jnp.int32(pos))
logits = tk.codec_logits(tp, h_x)[:, 0]
ref = sample_token_inner(jax.random.PRNGKey(0), logits, temperature=0.0,
    top_k=50, top_p=1.0, repetition_penalty=1.05, seen=seen, suppress_mask=supp)
hx = np.asarray(h_x[:, 0], np.float32); hk = np.asarray(h_k[:, 0], np.float32)
log(f"hidden scaled maxdiff: {np.abs(hk-hx).max()/(np.abs(hx).mean()+1e-6):.4f}")
lx = np.asarray(logits[0], np.float32)
top2 = np.sort(lx)[-2:]
log(f"greedy: kernel={int(code_k[0])} xla={int(ref[0])} gap_sigma={(top2[1]-top2[0])/(np.std(lx)+1e-6):.3f}")
del os.environ["QWEN3TTS_NO_TALKER_KERNEL"]

# stochastic: run 200 draws with different seeds, all must be unsuppressed
@jax.jit
def draw(tp_, cache_, x_, seed):
    _, _, c = tk.forward_step_sample(
        tp_, cfg, x_, cache_, jnp.int32(pos), seen=seen, suppress_add=supp_add,
        seed=seed, temperature=0.9, top_k=50,
        repetition_penalty=1.05, eos_token_id=eos)
    return c[0]
t0 = time.time()
codes = [int(draw(tp, cache, x, jnp.asarray([i, i * 7 + 1], jnp.int32))) for i in range(20)]
log(f"20 stochastic draws {time.time()-t0:.1f}s; uniq={len(set(codes))}")
sup_np = np.asarray(supp)
bad = [c for c in codes if sup_np[c] and c != eos]
log(f"suppressed draws: {len(bad)} (must be 0)")
# every draw must be in the XLA top-50 (+ EOS) given hidden parity
thresh = np.sort(lx)[-50]
ok = all(lx[c] >= thresh - 0.1 * np.std(lx) or c == eos for c in codes)
log(f"all draws within top-50 band: {ok}")
log("OK" if (len(bad) == 0 and ok and (int(code_k[0]) == int(ref[0]) or (top2[1]-top2[0])/(np.std(lx)+1e-6) < 0.05)) else "MISMATCH")
