"""Profile the vocoder: stage timings + conv implementation comparison.

Timing rule on this box: jits RETURN A SCALAR (sum) and sync via
np.asarray — block_until_ready intermittently returns early on the axon
tunnel and produces garbage timings.
"""
import functools
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from qwen3tts_tpu.models import vocoder as vc
from qwen3tts_tpu.config import TokenizerDecoderConfig
from qwen3tts_tpu.ops.conv import causal_conv1d, causal_conv1d_transpose

vcfg = TokenizerDecoderConfig()
print("device:", jax.devices()[0], flush=True)
which = sys.argv[1] if len(sys.argv) > 1 else "all"


def timeit(name, fn, *args, n=5):
    np.asarray(fn(*args))
    t0 = time.time()
    for _ in range(n):
        np.asarray(fn(*args))
    print(f"{name:40s}: {(time.time()-t0)/n*1e3:8.2f} ms", flush=True)


if which in ("all", "stages"):
    vp = vc.init_vocoder_params(jax.random.PRNGKey(2), vcfg, jnp.float32)
    codes = jnp.zeros((1, 128, 16), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("stage",))
    def upto(params, codes, stage: str):
        h = vc.rvq_decode(params, vcfg, codes)
        if stage == "rvq":
            return h.sum()
        h = causal_conv1d(h, params["pre_conv"]["w"], params["pre_conv"]["b"])
        if stage == "pre_conv":
            return h.sum()
        h = vc.pre_transformer(params["pre_transformer"], vcfg, h, jnp.int32(66))
        if stage == "pre_transformer":
            return h.sum()
        for st, ratio in zip(params["upsample"], vcfg.upsampling_ratios):
            h = causal_conv1d_transpose(h, st["conv"]["w"], st["conv"]["b"], stride=ratio)
            h = vc.convnext_block(st["convnext"], h)
        if stage == "upsample":
            return h.sum()
        if stage == "init_conv":
            return causal_conv1d(h, params["decoder"]["init_conv"]["w"],
                                 params["decoder"]["init_conv"]["b"]).sum()
        return vc.main_decoder(params["decoder"], vcfg, h).sum()

    for st in ("rvq", "pre_conv", "pre_transformer", "upsample", "init_conv", "full"):
        timeit(f"through {st}", upto, vp, codes, st)

if which in ("all", "conv"):
    T, C = 245760, 96
    rs = np.random.RandomState(0)
    x32 = jax.device_put(rs.randn(1, T, C).astype(np.float32))
    w32 = jax.device_put((rs.randn(7, C, C) / 26).astype(np.float32))
    b32 = jax.device_put(np.zeros(C, np.float32))

    @jax.jit
    def conv_xla(x, w, b):
        return causal_conv1d(x, w, b).sum()

    @jax.jit
    def conv_im2col(x, w, b):
        k, C_ = w.shape[0], w.shape[1]
        Tn = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
        cols = jnp.concatenate([xp[:, i : i + Tn] for i in range(k)], axis=-1)
        y = jax.lax.dot_general(
            cols, w.reshape(k * C_, w.shape[2]), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y + b).sum()

    timeit("conv k7 f32 XLA", conv_xla, x32, w32, b32)
    timeit("conv k7 f32 im2col", conv_im2col, x32, w32, b32)
    xb, wb, bb = (a.astype(jnp.bfloat16) for a in (x32, w32, b32))
    timeit("conv k7 bf16 XLA", conv_xla, xb, wb, bb)
    timeit("conv k7 bf16 im2col", conv_im2col, xb, wb, bb)

if which in ("all", "snake"):
    from qwen3tts_tpu.ops.norms import snake_beta

    T, C = 245760, 96
    rs = np.random.RandomState(0)
    x = jax.device_put(rs.randn(1, T, C).astype(np.float32))
    a = jax.device_put(np.zeros(C, np.float32))
    b = jax.device_put(np.zeros(C, np.float32))

    @jax.jit
    def snk(x, a, b):
        return snake_beta(x, a, b).sum()

    timeit("snake_beta f32 [245760, 96]", snk, x, a, b)
