"""Independent sustained-HBM-read measurement for the (tunneled) v5e.

The weight-stream accounting (tools/exp_weight_stream.py) measured the
talker kernel's blocked weight operands streaming at ~500 GB/s against
the 819 GB/s nominal peak, insensitive to DMA granularity. Question: is
~500 GB/s the platform's real sustained read rate, or is the Pallas grid
pipeline's implicit double-buffer under-issuing?

Methodology note: on this backend single-dispatch wall timings under
~1 ms are unreliable (block_until_ready returned 0.086 ms for a 1 GB
reduction — 11 TB/s — on one trial). Every probe here runs N iterations
of the read inside ONE jitted fori_loop, with an iteration-dependent
dynamic offset so XLA cannot hoist the loop-invariant read, and times
the whole dispatch — the same methodology as exp_weight_stream.py.

Probes (all reading ~512 MB/iteration):
  xla_red        strided jnp reduction with a per-iteration dynamic
                 offset — XLA's own memory pipeline, no Pallas.
  pallas blk=N   pallas grid kernel reducing blocked [blk_rows, 1024]
                 int8 operands (the talker kernel's access pattern) with
                 a per-iteration index_map offset.

Usage: python tools/exp_hbm_peak.py [N_ITERS]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50
GB = 1 << 30
COLS = 1024
ROWS = 512 * 1024  # x 1024 int8 = 512 MB read per iteration
PAD = 8 * 1024  # extra rows so the dynamic offset varies per iteration


def log(*a):
    print(*a, flush=True)


def time_loop(loop, *args):
    y = loop(*args)
    jax.block_until_ready(y)
    t0 = time.time()
    y = loop(*args)
    jax.block_until_ready(y)
    dt = (time.time() - t0) / N
    return dt, y


def main():
    x = jax.random.randint(
        jax.random.PRNGKey(0), (ROWS + PAD, COLS), -128, 127, jnp.int8
    )
    jax.block_until_ready(x)
    nbytes = ROWS * COLS
    log(f"read/iter: {nbytes / GB:.2f} GB int8, N={N} iters per dispatch")

    # --- XLA reduction, offset varies per iteration ---
    @jax.jit
    def xla_loop(x):
        def body(i, acc):
            sl = jax.lax.dynamic_slice(x, (i * 8, 0), (ROWS, COLS))
            return acc + jnp.sum(sl, dtype=jnp.int32)

        return jax.lax.fori_loop(0, N, body, jnp.int32(0))

    dt, _ = time_loop(xla_loop, x)
    log(f"xla_red        : {dt * 1e3:7.3f} ms/iter -> {nbytes / GB / dt:6.1f} GB/s")

    # --- Pallas blocked reductions ---
    def kern(off_ref, x_ref, o_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        # sum the WHOLE block: Mosaic narrows the streamed window to what
        # the body reads (verified: an 8-row read of a 4 MB block measured
        # 435 TB/s "bandwidth"), so a partial read measures nothing
        o_ref[...] += jnp.sum(
            x_ref[...].astype(jnp.int32), axis=0, keepdims=True
        )

    for blk_mb in (4, 8, 16, 32):
        blk_rows = blk_mb * (1 << 20) // COLS
        grid = ROWS // blk_rows
        call = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec(
                        (blk_rows, COLS), lambda i, off: (off[0] + i, 0)
                    )
                ],
                out_specs=pl.BlockSpec((1, COLS), lambda i, off: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((1, COLS), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 2**20,
            ),
        )

        @jax.jit
        def ploop(x):
            def body(i, acc):
                # offset in blocks: alternate 0/1 so the read window moves
                off = jax.lax.rem(i, 2).reshape(1)
                return acc + call(off, x)[0, 0]

            return jax.lax.fori_loop(0, N, body, jnp.int32(0))

        try:
            dt, _ = time_loop(ploop, x)
        except Exception as e:  # noqa: BLE001 - report and continue
            log(f"pallas blk={blk_mb:3d}MB: FAILED ({type(e).__name__})")
            continue
        log(
            f"pallas blk={blk_mb:3d}MB: {dt * 1e3:7.3f} ms/iter -> "
            f"{nbytes / GB / dt:6.1f} GB/s  (grid={grid})"
        )


if __name__ == "__main__":
    main()
