"""Hardware validation: batched talker-step kernel vs XLA batched step.

B=2 sequences at different cache offsets through both paths on the real
chip; hidden states and appended k/v rows must agree within bf16 noise.
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.utils import host_init as hi
from __graft_entry__ import _flagship_06b


def log(*a):
    print(*a, flush=True)


cfg = _flagship_06b()
t0 = time.time()
tp = hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16)
tp = dict(tp)
tp["layers"] = tk.fuse_layer_projections(tp["layers"])
tp = quantize_decode_params_int8(tp, "codec_head")
jax.block_until_ready(tp["layers"]["input_layernorm"])
log(f"init {time.time() - t0:.1f}s")

B, T, H = 2, 512, cfg.hidden_size
cache = tk.make_cache(cfg, B, T, jnp.bfloat16)
pre = (
    jax.random.normal(jax.random.PRNGKey(3), (B, 200, H), jnp.float32) * 0.2
).astype(jnp.bfloat16)
_, cache = tk.forward(tp, cfg, pre, cache, jnp.int32(0))
jax.block_until_ready(cache.k)
offsets = jnp.array([137, 200], jnp.int32)
x = (
    jax.random.normal(jax.random.PRNGKey(5), (B, 1, H), jnp.float32) * 0.2
).astype(jnp.bfloat16)

t0 = time.time()
h_k, cache_k = jax.jit(
    lambda *a: tk.forward_batched_step(a[0], cfg, *a[1:])
)(tp, x, cache, offsets)
jax.block_until_ready(h_k)
log(f"kernel step compile+run {time.time() - t0:.1f}s")

os.environ["QWEN3TTS_NO_TALKER_KERNEL"] = "1"
t0 = time.time()
h_x, cache_x = jax.jit(
    lambda *a: tk.forward_batched_step(a[0], cfg, *a[1:])
)(tp, x, cache, offsets)
jax.block_until_ready(h_x)
log(f"xla step compile+run {time.time() - t0:.1f}s")

hx = np.asarray(h_x, np.float32)
hk = np.asarray(h_k, np.float32)
rel = np.abs(hk - hx).max() / (np.abs(hx).mean() + 1e-6)
log(f"hidden scaled maxdiff: {rel:.4f}")
ok = rel < 0.2
for b in range(B):
    kx = np.asarray(cache_x.k[:, b, :, int(offsets[b]), :], np.float32)
    kk = np.asarray(cache_k.k[:, b, :, int(offsets[b]), :], np.float32)
    d = np.abs(kk - kx).max() / (np.abs(kx).mean() + 1e-6)
    log(f"k row seq {b} scaled maxdiff: {d:.4f}")
    ok = ok and d < 0.15
log("OK" if ok else "MISMATCH")
