"""Profile the vocoder: stage timings + conv implementation comparison."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from qwen3tts_tpu.models import vocoder as vc
from qwen3tts_tpu.config import TokenizerDecoderConfig
from qwen3tts_tpu.ops.conv import causal_conv1d

vcfg = TokenizerDecoderConfig()
print("device:", jax.devices()[0], flush=True)
which = sys.argv[1] if len(sys.argv) > 1 else "all"


def timeit(name, fn, *args, n=5):
    y = fn(*args); jax.tree.leaves(y)[0].block_until_ready()
    t0 = time.time()
    for _ in range(n):
        y = fn(*args)
        jax.tree.leaves(y)[0].block_until_ready()
    print(f"{name:40s}: {(time.time()-t0)/n*1e3:8.2f} ms", flush=True)


if which in ("all", "stages"):
    vp = vc.init_vocoder_params(jax.random.PRNGKey(2), vcfg, jnp.float32)
    codes = jnp.zeros((1, 128, 16), jnp.int32)

    import functools

    @functools.partial(jax.jit, static_argnames=("stage",))
    def upto(params, codes, stage: str):
        h = vc.rvq_decode(params, vcfg, codes)
        if stage == "rvq":
            return h
        h = causal_conv1d(h, params["pre_conv"]["w"], params["pre_conv"]["b"])
        if stage == "pre_conv":
            return h
        h = vc.pre_transformer(params["pre_transformer"], vcfg, h, jnp.int32(66))
        if stage == "pre_transformer":
            return h
        from qwen3tts_tpu.ops.conv import causal_conv1d_transpose

        for st, ratio in zip(params["upsample"], vcfg.upsampling_ratios):
            h = causal_conv1d_transpose(h, st["conv"]["w"], st["conv"]["b"], stride=ratio)
            h = vc.convnext_block(st["convnext"], h)
        if stage == "upsample":
            return h
        return vc.main_decoder(params["decoder"], vcfg, h)

    for st in ("rvq", "pre_conv", "pre_transformer", "upsample", "full"):
        timeit(f"through {st}", upto, vp, codes, st)

if which in ("all", "conv"):
    # single conv at the last-stage shape: XLA conv vs im2col matmul
    T, C = 245760, 96
    rs = np.random.RandomState(0)
    x = jax.device_put(rs.randn(1, T, C).astype(np.float32))
    w = jax.device_put((rs.randn(7, C, C) / 26).astype(np.float32))
    b = jax.device_put(np.zeros(C, np.float32))

    @jax.jit
    def conv_xla(x, w, b):
        return causal_conv1d(x, w, b)

    @jax.jit
    def conv_im2col(x, w, b):
        k = w.shape[0]
        xp = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
        cols = jnp.concatenate([xp[:, i : i + T] for i in range(k)], axis=-1)
        return jax.lax.dot_general(
            cols, w.reshape(k * C, C), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b

    timeit("conv k7 XLA (T=245760, C=96)", conv_xla, x, w, b)
    timeit("conv k7 im2col matmul", conv_im2col, x, w, b)
    y1 = np.asarray(conv_xla(x, w, b))
    y2 = np.asarray(conv_im2col(x, w, b))
    print("max diff:", np.abs(y1 - y2).max(), flush=True)

    # bf16 variants
    import ml_dtypes
    xb = x.astype(jnp.bfloat16); wb = w.astype(jnp.bfloat16); bb = b.astype(jnp.bfloat16)
    timeit("conv k7 XLA bf16", conv_xla, xb, wb, bb)
    timeit("conv k7 im2col bf16", conv_im2col, xb, wb, bb)
