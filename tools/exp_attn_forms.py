"""Microbench: batched GQA decode-attention matmul formulations on TPU.

The B=32 talker kernel spends ~2.1 ms/frame/block in attention, measured
tile-load bound (tools/exp_attn_cost.py: 2.13 ms per extra 128-row KV
block = B*NKV [G=2,D]x[D,128] sub-matmuls paying a full 128-cycle MXU
weight-tile load for 2 rows of use). Candidate restructures trade wasted
FLOPs for wider matmuls that can pipeline/parallelize tile loads:

  a) batched-small (current): [B*NKV, G, D] x [B*NKV, bt, D]
  b) per-seq wide:  [B, NQ, D] x [B, D, NKV*bt]   (8x FLOPs waste, N=1024)
  c) grouped wide:  [B/8, 8*NQ, D] x [B/8, D, 8*NKV*bt] (64x waste, N=8192)
  c2) grouped wide, K in natural [rows, D] layout contracted on D (the
      form the kernel could use without transposing the KV stream)

Each form runs its scores+values pair inside ONE pallas kernel with an
in-kernel fori_loop; the loop count doubles to check linear scaling
(device-loop timings that don't scale with n are artifacts — see
project memory). Elementwise softmax-ish work is intentionally excluded:
this probes the matmul floor only.

Usage: python tools/exp_attn_forms.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, NQ, NKV, D, BT = 32, 16, 8, 128, 128
G = NQ // NKV


def log(*a):
    print(*a, flush=True)


def make_kernel(form: str, n: int):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        def body(i, acc):
            # i-dependent q: stops the compiler hoisting the matmuls
            q = q_ref[...] + (i * 1e-6).astype(jnp.bfloat16)
            if form == "a":  # batched small: contract D, batch B*NKV
                s = jax.lax.dot_general(
                    q, k_ref[...], (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [B*NKV, G, bt]
                o = jax.lax.dot_general(
                    s.astype(jnp.bfloat16), v_ref[...],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [B*NKV, G, D]
            elif form == "c2":  # wide, k natural [*, W, D], contract D
                s = jax.lax.dot_general(
                    q, k_ref[...], (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [*, M, W]
                o = jax.lax.dot_general(
                    s.astype(jnp.bfloat16), v_ref[...],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [*, M, D]
            else:  # wide: k pre-transposed [*, D, W], v [*, W, D]
                s = jax.lax.dot_general(
                    q, k_ref[...], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [*, M, W]
                o = jax.lax.dot_general(
                    s.astype(jnp.bfloat16), v_ref[...],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [*, M, D]
            return acc + jnp.sum(o.reshape(-1, o.shape[-1]), axis=0, keepdims=True)

        o_ref[...] = jax.lax.fori_loop(
            0, n, body, jnp.zeros((1, D), jnp.float32)
        )

    return kernel


def run_form(form: str, q, k, v, n: int) -> float:
    f = pl.pallas_call(
        make_kernel(form, n),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )
    fj = jax.jit(f)
    float(fj(q, k, v)[0, 0])  # compile + warm
    best = float("inf")
    chk = 0.0
    for _ in range(5):  # min-of-5: tunnel dispatch jitter is tens of ms
        t0 = time.time()
        r = fj(q, k, v)
        chk = float(r[0, 0])  # device->host sync
        best = min(best, time.time() - t0)
    return best, chk


def main():
    key = jax.random.PRNGKey(0)
    shapes = {
        "a": ((B * NKV, G, D), (B * NKV, BT, D), (B * NKV, BT, D)),
        "b": ((B, NQ, D), (B, D, NKV * BT), (B, NKV * BT, D)),
        "c": ((B // 8, 8 * NQ, D), (B // 8, D, 8 * NKV * BT), (B // 8, 8 * NKV * BT, D)),
        "c2": ((B // 8, 8 * NQ, D), (B // 8, 8 * NKV * BT, D), (B // 8, 8 * NKV * BT, D)),
    }
    log(f"device: {jax.devices()[0].device_kind}")
    for form, (qs, ks, vs) in shapes.items():
        q = (jax.random.normal(key, qs, jnp.float32) * 0.1).astype(jnp.bfloat16)
        k = (jax.random.normal(key, ks, jnp.float32) * 0.1).astype(jnp.bfloat16)
        v = (jax.random.normal(key, vs, jnp.float32) * 0.1).astype(jnp.bfloat16)
        t1, _ = run_form(form, q, k, v, 2000)
        t2, _ = run_form(form, q, k, v, 4000)
        per = (t2 - t1) / 2000  # dispatch overhead cancels
        lin = t2 / t1 if t1 > 0 else float("nan")
        log(f"form {form}: n=2000 {t1 * 1e3:.1f} ms, n=4000 {t2 * 1e3:.1f} ms "
            f"-> {per * 1e6:.2f} us/iter (scale {lin:.2f}x; ~2.0 = trustworthy)")


if __name__ == "__main__":
    main()
