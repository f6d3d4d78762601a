"""Vocoder decode cost vs frame-bucket size (offline switch ladder design).

The fused generate+vocode program (tts._generate_and_decode) decodes the
smallest bucket covering n_frames via lax.switch. The headline 66-frame
utterance under max_frames=128 pays a 128-frame decode (~48% padding
waste). Question: is vocoder cost linear enough in the bucket size that a
finer ladder (e.g. 72/96 under 128) buys real RTF, and what does each
extra branch cost in compile time?

Timing rule on this box: jits return the waveform; sync via np.asarray
(block_until_ready intermittently returns early on the axon tunnel).

Usage: python tools/exp_voc_bucket.py [--dtype f32|bf16] [b1 b2 ...]
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from qwen3tts_tpu.models import vocoder as vc
from qwen3tts_tpu.config import TokenizerDecoderConfig

vcfg = TokenizerDecoderConfig()
print("device:", jax.devices()[0], flush=True)

argv = sys.argv[1:]
dtype = jnp.float32
if argv[:2] and argv[0] == "--dtype":
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[argv[1]]
    argv = argv[2:]
buckets = [int(a) for a in argv] or [32, 48, 64, 72, 96, 128, 192, 256]

# host-side init: eval_shape the init fn, fill with numpy randoms, device_put
# (the jitted init program alone takes minutes to compile over the tunnel)
shapes = jax.eval_shape(
    lambda k: vc.init_vocoder_params(k, vcfg, dtype), jax.random.PRNGKey(2)
)
rng = np.random.default_rng(2)
params = jax.tree.map(
    lambda s: jax.device_put(
        (rng.standard_normal(s.shape) * 0.02).astype(s.dtype)
    ),
    shapes,
)
jax.block_until_ready(jax.tree.leaves(params)[0])
print("params ready", flush=True)

for b in buckets:
    codes = jnp.zeros((1, b, vcfg.num_quantizers), jnp.int32)
    n = jnp.int32(min(b, 66))
    fn = jax.jit(lambda p, c, n: vc.decode(p, vcfg, c, n)[0])
    t0 = time.time()
    np.asarray(fn(params, codes, n))
    compile_s = time.time() - t0
    t0 = time.time()
    N = 10
    for _ in range(N):
        np.asarray(fn(params, codes, n))
    dt = (time.time() - t0) / N
    print(
        f"bucket {b:4d}: {dt * 1e3:7.2f} ms/decode  "
        f"({dt / b * 1e3:6.3f} ms/frame, compile {compile_s:5.1f}s)",
        flush=True,
    )
