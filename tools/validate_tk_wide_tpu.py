"""Hardware validation: grouped-wide batched talker attention, B=8.

One flagship-0.6B decode step with mixed per-sequence offsets through
three paths on the real chip: the grouped-wide kernel (default at B=8),
the narrow kernel (QWEN3TTS_TK_WIDE_SG=-1), and the XLA batched step.
Wide and narrow are the same f32 flash-attention math modulo summation
order; all three must agree within bf16 noise.
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
from qwen3tts_tpu.ops.rope import mrope_cos_sin
from qwen3tts_tpu.ops.norms import rms_norm
from qwen3tts_tpu.utils import host_init as hi
from __graft_entry__ import _flagship_06b


def log(*a):
    print(*a, flush=True)


def main():
    cfg = _flagship_06b()
    B, T = 8, 512
    t0 = time.time()
    params = hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16)
    params["layers"] = tk.fuse_layer_projections(params["layers"])
    params = quantize_decode_params_int8(params, "codec_head")
    jax.block_until_ready(params["norm"])
    log(f"init {time.time() - t0:.1f}s")

    H = cfg.hidden_size
    cache = tk.make_cache(cfg, B, T, jnp.bfloat16)
    pre = (
        jax.random.normal(jax.random.PRNGKey(3), (B, 180, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    _, cache = tk.forward(params, cfg, pre, cache, jnp.int32(0))
    offsets = jnp.array([37, 180, 5, 130, 64, 178, 91, 1], jnp.int32)
    x = (
        jax.random.normal(jax.random.PRNGKey(5), (B, 1, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    cos, sin = mrope_cos_sin(
        offsets[:, None], cfg.head_dim, cfg.rope_theta, cfg.mrope_section,
        jnp.bfloat16,
    )

    from qwen3tts_tpu.ops.talker_kernel import talker_decode_step

    t0 = time.time()
    h_w, k_w, v_w = talker_decode_step(
        params, cfg, x, cache.k, cache.v, offsets, cos, sin
    )
    jax.block_until_ready(h_w)
    log(f"wide step (compile+run) {time.time() - t0:.1f}s")

    os.environ["QWEN3TTS_TK_WIDE_SG"] = "-1"
    try:
        t0 = time.time()
        h_n, k_n, v_n = talker_decode_step(
            params, cfg, x, cache.k, cache.v, offsets, cos, sin
        )
        jax.block_until_ready(h_n)
        log(f"narrow step (compile+run) {time.time() - t0:.1f}s")
    finally:
        del os.environ["QWEN3TTS_TK_WIDE_SG"]

    h_x, _ = jax.jit(
        lambda p, e, c, o: tk.forward_batched_step(p, cfg, e, c, o)
    )(params, x, cache, offsets)

    fn = params["norm"]
    hw = np.asarray(rms_norm(h_w, fn, cfg.rms_norm_eps), np.float32)
    hn = np.asarray(rms_norm(h_n, fn, cfg.rms_norm_eps), np.float32)
    hx = np.asarray(rms_norm(h_x[:, None, 0], fn, cfg.rms_norm_eps), np.float32)
    ok = True
    d_wn = np.abs(hw - hn).max() / (np.abs(hn).mean() + 1e-6)
    d_wx = np.abs(hw - hx).max() / (np.abs(hx).mean() + 1e-6)
    dk = np.abs(np.asarray(k_w, np.float32) - np.asarray(k_n, np.float32)).max()
    dv = np.abs(np.asarray(v_w, np.float32) - np.asarray(v_n, np.float32)).max()
    log(f"wide vs narrow hidden: scaled {d_wn:.4f} (tol 0.05)")
    log(f"wide vs XLA hidden:    scaled {d_wx:.4f} (tol 0.15)")
    log(f"k/v rows wide vs narrow: max {dk} / {dv} (same qkv math: 0 expected)")
    ok &= d_wn < 0.05 and d_wx < 0.15 and dk == 0.0 and dv == 0.0
    print("PASS" if ok else "FAIL", flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
