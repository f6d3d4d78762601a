"""Cost of dynamic_update_slice chains on a big carried buffer (v5e).

Follow-up to tools/exp_op_overhead.py (fused elementwise ops are free):
the microbench `scatter` component measured ~10 us per DUS in a 64-DUS
chain updating a [28, 32, 8, 256, 128] bf16 cache inside fori_loop.
Separates: (a) per-DUS fixed cost vs chain length, (b) dynamic vs static
start index, (c) one batched-dim DUS writing the same bytes.

Usage: python tools/exp_dus_cost.py
"""

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
    log(f"{name:28s}: {dt / ITERS * 1e3:7.3f} ms/iter (compile {compile_s:.0f}s)")
    return dt / ITERS


def main():
    buf = jnp.zeros((L, B, H, T, D), jnp.bfloat16)
    rows = jnp.ones((L, B, H, D), jnp.bfloat16)
    offsets = jnp.arange(B, dtype=jnp.int32) % 64 + 24

    def chain(n_dus, dynamic=True):
        @jax.jit
        def loop(buf, rows, offsets):
            def body(i, carry):
                buf, off = carry
                for b in range(n_dus):
                    start = (
                        (0, b, 0, off[b], 0) if dynamic else (0, b, 0, 24, 0)
                    )
                    buf = jax.lax.dynamic_update_slice(
                        buf, rows[:, b : b + 1, :, None], start
                    )
                return buf, off + 1

            buf, _ = jax.lax.fori_loop(0, ITERS, body, (buf, offsets))
            return buf[0, 0, 0, 0, 0]

        return loop

    t8 = timeit("8-DUS chain (dyn start)", chain(8), buf, rows, offsets)
    t32 = timeit("32-DUS chain (dyn start)", chain(32), buf, rows, offsets)
    timeit("32-DUS chain (static start)", chain(32, False), buf, rows, offsets)

    @jax.jit
    def one_big(buf, rows, offsets):
        def body(i, carry):
            buf, off = carry
            # one DUS writing [L, B, H, 1, D] at a shared dynamic offset
            buf = jax.lax.dynamic_update_slice(
                buf, rows[:, :, :, None], (0, 0, 0, off[0], 0)
            )
            return buf, off + 1

        buf, _ = jax.lax.fori_loop(0, ITERS, body, (buf, offsets))
        return buf[0, 0, 0, 0, 0]

    timeit("ONE batched DUS (same bytes)", one_big, buf, rows, offsets)
    log(f"per-DUS marginal: {(t32 - t8) / 24 * 1e6:.2f} us")


if __name__ == "__main__":
    main()
