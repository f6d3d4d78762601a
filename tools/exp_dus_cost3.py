"""Part 3: make the two-buffer DUS chain run in place.

exp_dus_cost2 found: a 32-DUS chain over ONE carried [28,32,8,256,128]
bf16 buffer is free, but chaining BOTH k and v in the same fori_loop body
costs 0.85 ms/iter — one buffer's updates stop aliasing in place
(~a full-buffer copy per iteration). Variants (all keep both chains LIVE
by summing one element of each at the end):

  two      — baseline two-buffer chain (expect ~0.85)
  donate   — same with donate_argnums on both buffers
  inter    — k/v DUSes interleaved per sequence
  stacked  — ONE [2, L, B, H, T, D] buffer, 64-DUS chain
  batchone — two buffers, ONE batched DUS each at a shared offset
             (what a uniform-offset design would allow)

Usage: python tools/exp_dus_cost3.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

ITERS = 66
L, B, H, T, D = 28, 32, 8, 256, 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args):
    t0 = time.time()
    y = fn(*args)
    jax.block_until_ready(y)
    compile_s = time.time() - t0
    t0 = time.time()
    n = 3
    for _ in range(n):
        y = fn(*args)
        jax.block_until_ready(y)
    dt = (time.time() - t0) / n
    log(f"{name:8s}: {dt / ITERS * 1e3:7.3f} ms/iter (compile {compile_s:.0f}s)")


def chain(buf, rows, off):
    for b in range(B):
        buf = jax.lax.dynamic_update_slice(
            buf, rows[:, b : b + 1, :, None], (0, b, 0, off[b], 0)
        )
    return buf


def main():
    kbuf = jnp.zeros((L, B, H, T, D), jnp.bfloat16)
    vbuf = jnp.zeros((L, B, H, T, D), jnp.bfloat16)
    sbuf = jnp.zeros((2, L, B, H, T, D), jnp.bfloat16)
    rows = jnp.ones((L, B, H, D), jnp.bfloat16)
    offsets = jnp.full((B,), 24, jnp.int32)

    def two_body(kb, vb, rows, off0):
        def body(i, carry):
            kb, vb, off = carry
            return chain(kb, rows, off), chain(vb, rows, off), off + 1

        kb, vb, _ = jax.lax.fori_loop(0, ITERS, body, (kb, vb, off0))
        return kb[0, 0, 0, 0, 0] + vb[0, 0, 0, 0, 0]

    timeit("two", jax.jit(two_body), kbuf, vbuf, rows, offsets)
    timeit(
        "donate",
        jax.jit(two_body, donate_argnums=(0, 1)),
        kbuf + 0, vbuf + 0, rows, offsets,
    )

    @jax.jit
    def inter(kb, vb, rows, off0):
        def body(i, carry):
            kb, vb, off = carry
            for b in range(B):
                upd = rows[:, b : b + 1, :, None]
                kb = jax.lax.dynamic_update_slice(kb, upd, (0, b, 0, off[b], 0))
                vb = jax.lax.dynamic_update_slice(vb, upd, (0, b, 0, off[b], 0))
            return kb, vb, off + 1

        kb, vb, _ = jax.lax.fori_loop(0, ITERS, body, (kb, vb, off0))
        return kb[0, 0, 0, 0, 0] + vb[0, 0, 0, 0, 0]

    timeit("inter", inter, kbuf, vbuf, rows, offsets)

    @jax.jit
    def stacked(sb, rows, off0):
        def body(i, carry):
            sb, off = carry
            for kv in range(2):
                for b in range(B):
                    sb = jax.lax.dynamic_update_slice(
                        sb, rows[None, :, b : b + 1, :, None],
                        (kv, 0, b, 0, off[b], 0),
                    )
            return sb, off + 1

        sb, _ = jax.lax.fori_loop(0, ITERS, body, (sb, off0))
        return sb[0, 0, 0, 0, 0, 0] + sb[1, 0, 0, 0, 0, 0]

    timeit("stacked", stacked, sbuf, rows, offsets)

    @jax.jit
    def batchone(kb, vb, rows, off0):
        def body(i, carry):
            kb, vb, off = carry
            kb = jax.lax.dynamic_update_slice(
                kb, rows[:, :, :, None], (0, 0, 0, off[0], 0)
            )
            vb = jax.lax.dynamic_update_slice(
                vb, rows[:, :, :, None], (0, 0, 0, off[0], 0)
            )
            return kb, vb, off + 1

        kb, vb, _ = jax.lax.fori_loop(0, ITERS, body, (kb, vb, off0))
        return kb[0, 0, 0, 0, 0] + vb[0, 0, 0, 0, 0]

    timeit("batchone", batchone, kbuf, vbuf, rows, offsets)


if __name__ == "__main__":
    main()
