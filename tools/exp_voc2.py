"""Careful MainDecoder breakdown: n=20, noop-floor subtraction."""
import functools
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from qwen3tts_tpu.models import vocoder as vc
from qwen3tts_tpu.config import TokenizerDecoderConfig
from qwen3tts_tpu.ops.conv import causal_conv1d, causal_conv1d_transpose
from qwen3tts_tpu.ops.norms import snake_beta

vcfg = TokenizerDecoderConfig()
print("device:", jax.devices()[0], flush=True)

N = 20
_floor = [0.0]


def timeit(name, fn, *args):
    np.asarray(fn(*args))
    t0 = time.time()
    for _ in range(N):
        np.asarray(fn(*args))
    dt = (time.time() - t0) / N * 1e3
    print(f"{name:44s}: {dt:8.2f} ms  (net {dt - _floor[0]:7.2f})", flush=True)
    return dt


@jax.jit
def noop(x):
    return x.sum()


_floor[0] = 0.0
_floor[0] = timeit("noop (RTT floor)", noop, jnp.zeros((8, 8)))

for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
    vp = vc.init_vocoder_params(jax.random.PRNGKey(2), vcfg, dt)
    dec = vp["decoder"]
    # latents after upsample: [1, 512, 1024]
    h0 = jnp.asarray(np.random.RandomState(0).randn(1, 512, vcfg.latent_dim) * 0.1, dt)

    @functools.partial(jax.jit, static_argnames=("nblocks",))
    def dec_upto(dec, h, nblocks: int):
        h = causal_conv1d(h, dec["init_conv"]["w"], dec["init_conv"]["b"])
        for i, (block, rate) in enumerate(zip(dec["blocks"], vcfg.upsample_rates)):
            if i >= nblocks:
                break
            h = snake_beta(h, block["snake"]["alpha"], block["snake"]["beta"])
            h = causal_conv1d_transpose(h, block["upsample"]["w"], block["upsample"]["b"], stride=rate)
            for name, d in (("res1", 1), ("res2", 3), ("res3", 9)):
                h = vc._residual_unit(block[name], h, d)
        if nblocks == 4:
            h = snake_beta(h, dec["out_snake"]["alpha"], dec["out_snake"]["beta"])
            h = causal_conv1d(h, dec["out_conv"]["w"], dec["out_conv"]["b"])
        return h.sum()

    for nb in (0, 1, 2, 3, 4):
        timeit(f"{dt_name} main_decoder blocks<={nb}", dec_upto, dec, h0, nb)
