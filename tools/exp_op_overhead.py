"""Measure fixed per-op overhead inside a fused device loop on this chip.

Hypothesis (from tools/microbench_batch.py `scatter`/`next`, 2026-08-18):
small XLA ops inside a compiled fori_loop cost ~8-10 us EACH regardless of
data size on the axon-tunneled v5e — which would make the decode body
op-count-bound and justify fusing all glue into the Pallas kernels.

Times fori_loops whose body chains N dependent tiny ops ([8, 128] f32
adds with rotating constants so XLA cannot CSE them), N in {10, 40, 160}:
slope = per-op cost.

Usage: python tools/exp_op_overhead.py
"""

import sys
import time

import jax
import jax.numpy as jnp

ITERS = 66


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(n_ops: int):
    @jax.jit
    def loop(x):
        def body(i, x):
            y = x + i.astype(jnp.float32)
            for j in range(n_ops):
                # dependent chain; varying op mix defeats fusion into one op?
                # XLA will fuse elementwise chains — alternate with a tiny
                # reduce + broadcast to force separate HLOs
                y = y * 1.0001 + jnp.max(y, axis=-1, keepdims=True) * 1e-6
            return y

        return jax.lax.fori_loop(0, ITERS, body, x)

    x = jnp.ones((8, 128), jnp.float32)
    t0 = time.time()
    y = loop(x)
    jax.block_until_ready(y)
    compile_s = time.time() - t0
    t0 = time.time()
    n = 5
    for _ in range(n):
        y = loop(x)
        jax.block_until_ready(y)
    dt = (time.time() - t0) / n
    log(
        f"n_ops={n_ops:4d}: {dt * 1e3:8.2f} ms total, "
        f"{dt / ITERS * 1e3:7.3f} ms/iter (compile {compile_s:.0f}s)"
    )
    return dt / ITERS


def main():
    ts = {n: run(n) for n in (10, 40, 160)}
    slope1 = (ts[40] - ts[10]) / 30
    slope2 = (ts[160] - ts[40]) / 120
    log(f"per-op cost: {slope1 * 1e6:.2f} us (10->40), {slope2 * 1e6:.2f} us (40->160)")


if __name__ == "__main__":
    main()
