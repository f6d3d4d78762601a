"""Hardware experiment: SG=1 wide attention for B=1 long-cache decode.

The narrow attention form amortizes each 128-row MXU K/V tile load over
only G=2 query rows; at long caches (1.7B, 4096 slots) the KV stream is
a large share of the step, so the same tile-load bound that hurt B=32
should hurt B=1 long decode. SG=1 wide puts all NQ query rows in front
of every key tile (NQ=16 -> 8x amortization) at NKV x wasted FLOPs.

Runs one 1.7B decode step at a deep offset through narrow (default at
B=1) and SG=1 wide (QWEN3TTS_TK_WIDE_SG=1), checks parity, and times
both as fused 32-step loops so per-step cost is visible above dispatch.

Usage: python tools/exp_wide_b1_long.py [offset=3500] [cache=4096]
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
from __graft_entry__ import _flagship_17b


def log(*a):
    print(*a, flush=True)


def main():
    off0 = int(sys.argv[1]) if sys.argv[1:] else 3500
    T = int(sys.argv[2]) if sys.argv[2:] else 4096
    cfg = _flagship_17b()
    H = cfg.hidden_size
    B = 1

    t0 = time.time()
    params = hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16)
    params["layers"] = tk.fuse_layer_projections(params["layers"])
    params = quantize_decode_params_int8(params, "codec_head")
    jax.block_until_ready(params["norm"])
    log(f"1.7B init {time.time() - t0:.1f}s  offset={off0} cache={T}")

    cache = tk.make_cache(cfg, B, T, jnp.bfloat16)
    pre = (
        jax.random.normal(jax.random.PRNGKey(3), (B, 512, H), jnp.float32)
        * 0.2
    ).astype(jnp.bfloat16)
    _, cache = tk.forward(params, cfg, pre, cache, jnp.int32(0))
    # the kernel only reads rows < offset; rows [512, off0) stay zero,
    # which is fine for a timing A/B (attention math still runs over them)
    offsets = jnp.array([off0], jnp.int32)
    x = (
        jax.random.normal(jax.random.PRNGKey(5), (B, 1, H), jnp.float32)
        * 0.2
    ).astype(jnp.bfloat16)
    cos, sin = mrope_cos_sin(
        offsets[:, None], cfg.head_dim, cfg.rope_theta, cfg.mrope_section,
        jnp.bfloat16,
    )

    from qwen3tts_tpu.ops import talker_kernel as tkk

    def one_step():
        return tkk.talker_decode_step(
            params, cfg, x, cache.k, cache.v, offsets, cos, sin
        )

    def loop32():
        # fused 32-step loop at a FIXED offset: pure step-cost timing
        def body(i, acc):
            h, _, _ = one_step()
            return acc + h.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, 32, body, jnp.float32(0.0))

    results = {}
    for tag, env in (("narrow", "-1"), ("wide_sg1", "1")):
        os.environ["QWEN3TTS_TK_WIDE_SG"] = env
        try:
            t0 = time.time()
            h, k, v = one_step()
            jax.block_until_ready(h)
            log(f"{tag}: step compile+run {time.time() - t0:.1f}s")
            results[tag] = np.asarray(
                rms_norm(h, params["norm"], cfg.rms_norm_eps), np.float32
            )
            lp = jax.jit(loop32)
            s = lp()
            jax.block_until_ready(s)
            times = []
            for _ in range(3):
                t0 = time.time()
                s = lp()
                jax.block_until_ready(s)
                times.append(time.time() - t0)
            dt = sorted(times)[1] / 32
            log(f"{tag}: {dt * 1e3:.3f} ms/step (median of 3x32)")
            results[tag + "_ms"] = dt * 1e3
        finally:
            del os.environ["QWEN3TTS_TK_WIDE_SG"]

    d = np.abs(results["narrow"] - results["wide_sg1"]).max() / (
        np.abs(results["narrow"]).mean() + 1e-6
    )
    log(f"narrow vs wide_sg1 hidden: scaled {d:.4f} (tol 0.05)")
    speed = results["narrow_ms"] / results["wide_sg1_ms"]
    log(f"wide_sg1 is {speed:.3f}x narrow at offset {off0}")
    print("PASS" if d < 0.05 else "FAIL", flush=True)


if __name__ == "__main__":
    main()
