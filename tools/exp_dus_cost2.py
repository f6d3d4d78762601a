"""Bisect why _scatter_append_batched costs 0.65 ms/frame while a raw
DUS chain costs ~0 (tools/exp_dus_cost.py vs microbench_batch `scatter`).

Variants, all 66-iteration fori_loops at B=32 on a [28,32,8,256,128] bf16
cache pair:
  raw      — raw-array carry, hand-inlined DUS chain (the fast baseline)
  fn       — same but through tk._scatter_append_batched (KVCache carry)
  tuple    — hand-inlined chain but carrying a KVCache NamedTuple
  twobuf   — raw carry, chain over BOTH k and v (64 DUSes)

Usage: python tools/exp_dus_cost2.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from qwen3tts_tpu.models import talker as tk
from __graft_entry__ import _flagship_06b

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
    cfg = _flagship_06b()
    kbuf = jnp.zeros((L, B, H, T, D), jnp.bfloat16)
    vbuf = jnp.zeros((L, B, H, T, D), jnp.bfloat16)
    rows = jnp.ones((L, B, H, D), jnp.bfloat16)
    offsets = jnp.full((B,), 24, jnp.int32)

    @jax.jit
    def raw(kbuf, rows, off0):
        def body(i, carry):
            buf, off = carry
            return chain(buf, rows, off), off + 1

        buf, _ = jax.lax.fori_loop(0, ITERS, body, (kbuf, off0))
        return buf[0, 0, 0, 0, 0]

    timeit("raw", raw, kbuf, rows, offsets)

    @jax.jit
    def fn(cache, rows, off0):
        def body(i, carry):
            cache, off = carry
            return tk._scatter_append_batched(cache, cfg, rows, rows, off), off + 1

        cache, _ = jax.lax.fori_loop(0, ITERS, body, (cache, off0))
        return cache.k[0, 0, 0, 0, 0]

    timeit("fn", fn, tk.KVCache(kbuf, vbuf), rows, offsets)

    @jax.jit
    def tup(cache, rows, off0):
        def body(i, carry):
            cache, off = carry
            cache = tk.KVCache(chain(cache.k, rows, off), chain(cache.v, rows, off))
            return cache, off + 1

        cache, _ = jax.lax.fori_loop(0, ITERS, body, (cache, off0))
        return cache.k[0, 0, 0, 0, 0]

    timeit("tuple", tup, tk.KVCache(kbuf, vbuf), rows, offsets)

    @jax.jit
    def twobuf(kbuf, vbuf, rows, off0):
        def body(i, carry):
            kb, vb, off = carry
            return chain(kb, rows, off), chain(vb, rows, off), off + 1

        kb, vb, _ = jax.lax.fori_loop(0, ITERS, body, (kbuf, vbuf, offsets))
        return kb[0, 0, 0, 0, 0] + vb[0, 0, 0, 0, 0]

    timeit("twobuf", twobuf, kbuf, vbuf, rows, offsets)


if __name__ == "__main__":
    main()
