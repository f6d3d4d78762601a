"""Flagship-shape parity of the fused talker-step kernel on the real chip."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp, numpy as np
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.ops.rope import mrope_cos_sin
from qwen3tts_tpu.ops.norms import rms_norm
from qwen3tts_tpu.ops.talker_kernel import step_supported, talker_decode_step
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
log(f"init {time.time()-t0:.1f}s; supported={step_supported(tp, cfg)}")

T = 2176  # production right-sized cache from bench.py shapes
pos = 90
cache = tk.make_cache(cfg, 1, T, jnp.bfloat16)
H = cfg.hidden_size
pre = (jax.random.normal(jax.random.PRNGKey(3), (1, pos, H), jnp.float32) * 0.2).astype(jnp.bfloat16)
t0 = time.time()
_, cache = tk.forward(tp, cfg, pre, cache, jnp.int32(0))
jax.block_until_ready(cache.k)
log(f"prefill compile+run {time.time()-t0:.1f}s")

x = (jax.random.normal(jax.random.PRNGKey(5), (1, 1, H), jnp.float32) * 0.2).astype(jnp.bfloat16)
off = jnp.int32(pos)

import os
os.environ["QWEN3TTS_NO_TALKER_KERNEL"] = "1"
t0 = time.time()
h_x, cache_x = tk.forward(tp, cfg, x, cache, off)
jax.block_until_ready(h_x)
log(f"xla step compile+run {time.time()-t0:.1f}s")
del os.environ["QWEN3TTS_NO_TALKER_KERNEL"]

positions = jnp.full((1, 1), pos, jnp.int32)
cos, sin = mrope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, cfg.mrope_section, jnp.bfloat16)
t0 = time.time()
h_k, k_new, v_new = talker_decode_step(tp, cfg, x, cache.k, cache.v, off, cos, sin)
h_k = rms_norm(h_k, tp["norm"], cfg.rms_norm_eps)
jax.block_until_ready(h_k)
log(f"kernel step compile+run {time.time()-t0:.1f}s")

hx = np.asarray(h_x, np.float32); hk = np.asarray(h_k, np.float32)
s = np.abs(hx).mean() + 1e-6
log(f"hidden scaled maxdiff: {np.abs(hk-hx).max()/s:.4f}")
kx = np.asarray(cache_x.k[:, 0, :, pos, :], np.float32)
vx = np.asarray(cache_x.v[:, 0, :, pos, :], np.float32)
kk = np.asarray(k_new, np.float32); vk = np.asarray(v_new, np.float32)
log(f"k scaled maxdiff: {np.abs(kk-kx).max()/(np.abs(kx).mean()+1e-6):.4f}")
log(f"v scaled maxdiff: {np.abs(vk-vx).max()/(np.abs(vx).mean()+1e-6):.4f}")
log("OK")
