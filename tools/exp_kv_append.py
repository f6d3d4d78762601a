"""EXPERIMENT (negative result, kept for the record): batched KV-cache
row append as ONE Pallas dispatch — measured NO WIN over the DUS chain.

Motivation: tools/microbench_batch.py's `scatter` case had measured the
per-sequence ``dynamic_update_slice`` chain
(models/talker.py::_scatter_append_batched) at 0.5-1.0 ms/frame at B=32,
reading as ~13-19% of the production frame. A direct per-row DMA into
the cache is illegal — Mosaic tiles HBM bf16 memrefs (8, 128) on the
last two dims, so a length-1 slice of the T dim cannot be a DMA operand
(the round-1 finding recorded in ops/attention.py's docstring) — so this
kernel appends at TILE granularity, read-modify-write, inside one
``pallas_call``:

  1. per sequence, DMA the 8-row aligned window containing its offset
     ([L, Hkv, 8, D]) from the HBM cache into VMEM,
  2. insert the new row at ``offset % 8`` with a sublane-iota select,
  3. DMA the window back (caches ANY-space, aliased input->output).

Measured 2026-08-20 on v5e (``python tools/exp_kv_append.py``):

  RMW kernel        0.529 ms/frame   <- DMA-bound: 128 strided copies
                                        with 2 KB contiguous runs
  DUS chain         0.488 ms/frame   (back-to-back in the same process)
  DUS chain, fresh  0.001 ms/frame   (first measurement in the process)

The third line is the real finding: the 0.5-1.0 ms "scatter cost" is a
MEASUREMENT-ORDER ARTIFACT, not a production cost. The identical jitted
chain measures free when benched first in a fresh process and ~0.5 ms
when benched after the talker-kernel loop has run (device memory state;
same family as the exp_dus_cost3 carry-init artifact). In the production
decode loop the carry is donated and every DUS provably aliases in
place, so there is no scatter to save — which is why this kernel (and
any uniform-slot ring/rotation redesign aimed at the same cost) is NOT
wired into models/talker.py. The corrected B=32 frame attribution lives
in ROADMAP.md.

Kept as a worked example of tile-granularity RMW DMA on HBM-resident
buffers (the only legal way to write sub-tile rows from inside a Mosaic
kernel) with interpret-mode + on-device parity against the DUS chain.
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WIN = 8  # bf16 sublane tile: the RMW window size


def _append_kernel(B: int, pos_ref, k_new_ref, v_new_ref, _k_in, _v_in,
                   k_out, v_out, wk, wv, sems):
    """pos_ref SMEM [B]; k_new/v_new VMEM [L, B, Hkv, D]; caches ANY
    [L, B, Hkv, T, D] (inputs aliased to outputs); wk/wv VMEM scratch
    [B, L, Hkv, _WIN, D]; sems DMA (B, 4)."""

    def window(cache_ref, b):
        algn = (pos_ref[b] // _WIN) * _WIN
        return cache_ref.at[:, b, :, pl.ds(algn, _WIN), :]

    reads = []
    for b in range(B):
        reads.append(pltpu.make_async_copy(window(k_out, b), wk.at[b], sems.at[b, 0]))
        reads.append(pltpu.make_async_copy(window(v_out, b), wv.at[b], sems.at[b, 1]))
    for c in reads:
        c.start()

    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _WIN, 1), 2)
    writes = []
    for b in range(B):
        r = pos_ref[b] - (pos_ref[b] // _WIN) * _WIN
        reads[2 * b].wait()
        wk[b] = jnp.where(sub == r, k_new_ref[:, b][:, :, None, :], wk[b])
        reads[2 * b + 1].wait()
        wv[b] = jnp.where(sub == r, v_new_ref[:, b][:, :, None, :], wv[b])
        writes.append(pltpu.make_async_copy(wk.at[b], window(k_out, b), sems.at[b, 2]))
        writes.append(pltpu.make_async_copy(wv.at[b], window(v_out, b), sems.at[b, 3]))
        writes[-2].start()
        writes[-1].start()
    for c in writes:
        c.wait()


def _append_call(k_cache, v_cache, k_new, v_new, offsets, *,
                 interpret: bool = False):
    """In-place (aliased) batched row append on bf16 caches. The enclosing
    decode loop's donated carry provides the buffer; returns (k, v)."""
    L, B, Hkv, D = k_new.shape
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_append_kernel, B),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vmem, vmem,
                  any_spec, any_spec],
        out_specs=[any_spec, any_spec],
        out_shape=[jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)],
        # inputs: offsets, k_new, v_new, k_cache, v_cache
        input_output_aliases={3: 0, 4: 1},
        scratch_shapes=[
            pltpu.VMEM((B, L, Hkv, _WIN, D), k_cache.dtype),
            pltpu.VMEM((B, L, Hkv, _WIN, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((B, 4)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=80 * 2**20),
        interpret=interpret,
    )(offsets.astype(jnp.int32), k_new, v_new, k_cache, v_cache)


def append_rows(cache, k_new, v_new, offsets, *, interpret: bool = False):
    """Append per-sequence k/v rows ([L, B, Hkv, D]) at ``offsets`` ([B])
    into a bf16 ``cache`` (KVCache) — one fused dispatch, in place.
    Semantics identical to models/talker.py::_scatter_append_batched."""
    from qwen3tts_tpu.models.talker import KVCache

    k, v = _append_call(
        cache.k, cache.v, k_new.astype(cache.k.dtype),
        v_new.astype(cache.v.dtype), offsets, interpret=interpret,
    )
    return KVCache(k, v)


def main():
    import sys
    import time

    import numpy as np

    from qwen3tts_tpu.models import talker as tk

    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    L, B, Hkv, T, D = 28, 32, 8, 256, 128
    k_new = jax.random.normal(
        jax.random.PRNGKey(0), (L, B, Hkv, D), jnp.float32
    ).astype(jnp.bfloat16)
    v_new = jax.random.normal(
        jax.random.PRNGKey(1), (L, B, Hkv, D), jnp.float32
    ).astype(jnp.bfloat16)
    offs = jnp.arange(B, dtype=jnp.int32) * 5 + 3
    base = lambda s: jax.random.normal(
        jax.random.PRNGKey(s), (L, B, Hkv, T, D), jnp.float32
    ).astype(jnp.bfloat16)
    cache = tk.KVCache(base(2), base(3))

    ref = tk._scatter_append_batched(cache, None, k_new, v_new, offs)
    out = append_rows(cache, k_new, v_new, offs, interpret=interpret)
    np.testing.assert_array_equal(np.asarray(ref.k), np.asarray(out.k))
    np.testing.assert_array_equal(np.asarray(ref.v), np.asarray(out.v))
    print("parity OK (non-zero base cache)", file=sys.stderr)
    if interpret:
        return

    def loop(append):
        @jax.jit
        def fn(cache, k_new, v_new, offs0):
            def body(i, carry):
                cache, offs = carry
                return append(cache, k_new, v_new, offs), offs + 1

            cache, _ = jax.lax.fori_loop(0, 66, body, (cache, offs0))
            return cache.k[0, 0, 0, 0, 0] + cache.v[0, 0, 0, 0, 0]

        return fn

    cases = [
        # NOTE: order matters — see the module docstring. The DUS chain
        # measures ~0.001 ms/frame when benched FIRST in a fresh process
        # and ~0.5 when benched after other loops have run.
        ("dus-chain (fresh)", loop(
            lambda c, k, v, o: tk._scatter_append_batched(c, None, k, v, o))),
        ("rmw-kernel", loop(append_rows)),
        ("dus-chain (after)", loop(
            lambda c, k, v, o: tk._scatter_append_batched(c, None, k, v, o))),
    ]
    for name, fn in cases:
        y = fn(cache, k_new, v_new, offs)
        jax.block_until_ready(y)
        t0 = time.time()
        for _ in range(5):
            y = fn(cache, k_new, v_new, offs)
            jax.block_until_ready(y)
        dt = (time.time() - t0) / 5
        print(f"{name}: {dt / 66 * 1e3:.3f} ms/frame", file=sys.stderr)


if __name__ == "__main__":
    main()
