"""Pallas decode attention streaming only the valid KV prefix.

The plain XLA decode path attends over the FULL static cache with a mask —
reading ``T_max`` rows from HBM every step regardless of how many are valid.
This kernel keeps the cache HBM-resident (memory_space=ANY) and streams ONLY
the 128-row blocks up to the current position through a double-buffered VMEM
pipeline with flash-style online softmax, so per-step attention HBM traffic
scales with the actual sequence length instead of the preallocated maximum.

The cache append itself stays an XLA ``dynamic_update_slice`` on the
donated while-loop carry (in-place, one row) — single-row VMEM->HBM DMAs
inside the kernel violate Mosaic's bf16 sublane tiling, and the DUS is
already free. The kernel runs in the same compiled decode program, so the
whole step remains one fused device computation.

Single-token (B=1) GQA decode:
  q:               [1, Hq, 1, D]   (QK-normed, rotary-applied)
  k_cache/v_cache: [1, Hkv, T, D]  (row ``pos`` already appended)
  pos:             scalar int32 — attend to slots 0..pos

Grid: one program per KV head; each handles its G = Hq/Hkv query heads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_T = 128
NEG_INF = -1e30  # python float: jnp constants would be captured as kernel consts


def _decode_attn_kernel(
    scale: float,
    scalars_ref,  # SMEM [2] int32 (scalar prefetch): [pos, layer]
    q_ref,  # VMEM [G, D]
    k_cache_hbm,  # ANY  [L, Hkv, T, D] full array
    v_cache_hbm,
    o_ref,  # VMEM [G, D]
    k_buf,  # VMEM scratch [2, BLOCK_T, D]
    v_buf,
    read_sems,  # DMA sems (2, 2)
):
    pos = scalars_ref[0]
    lyr = scalars_ref[1]
    h = pl.program_id(0)  # ANY-space refs stay whole-array: index head here
    T = k_cache_hbm.shape[2]
    n_blocks = T // BLOCK_T
    n_valid = jnp.minimum((pos + BLOCK_T) // BLOCK_T, n_blocks)

    def read(slot, blk):
        start = blk * BLOCK_T
        k_dma = pltpu.make_async_copy(
            k_cache_hbm.at[lyr, h, pl.ds(start, BLOCK_T), :], k_buf.at[slot],
            read_sems.at[slot, 0],
        )
        v_dma = pltpu.make_async_copy(
            v_cache_hbm.at[lyr, h, pl.ds(start, BLOCK_T), :], v_buf.at[slot],
            read_sems.at[slot, 1],
        )
        return k_dma, v_dma

    k0, v0 = read(0, 0)
    k0.start()
    v0.start()

    q = q_ref[...].astype(jnp.float32) * scale  # [G, D]
    G, D = q.shape
    m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((G, 1), jnp.float32)
    acc0 = jnp.zeros((G, D), jnp.float32)

    def body(b, carry):
        m, l, acc = carry
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < n_valid)
        def _():
            kn, vn = read(1 - slot, b + 1)
            kn.start()
            vn.start()

        kd, vd = read(slot, b)
        kd.wait()
        vd.wait()

        start = b * BLOCK_T
        k_blk = k_buf[slot].astype(jnp.float32)
        v_blk = v_buf[slot].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G, Bt]
        t_idx = start + jax.lax.broadcasted_iota(jnp.int32, (G, BLOCK_T), 1)
        s = jnp.where(t_idx <= pos, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, n_valid, body, (m0, l0, acc0))
    o_ref[...] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def decode_attention(
    q: jnp.ndarray,  # [1, Hq, 1, D]
    k_cache: jnp.ndarray,  # [1, Hkv, T, D] (row pos already written)
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,  # scalar int32
    scale: float,
):
    """Prefix-streaming decode attention. Returns out [1, Hq, 1, D]."""
    return decode_attention_inner(q, k_cache, v_cache, pos, scale)


def decode_attention_inner(
    q, k_cache, v_cache, pos, scale: float, layer=None, interpret: bool = False
):
    """Un-jitted body for composition inside larger jitted programs.

    Two cache layouts:
      layer=None: k/v_cache [1, Hkv, T, D]       (single-layer, B leading)
      layer=idx:  k/v_cache [L, 1, Hkv, T, D]    (the scan-carried full
                  cache; ``layer`` selects the slice INSIDE the kernel so
                  no per-layer cache copy is materialized)
    """
    _, Hq, _, D = q.shape
    if layer is None:
        # [1, Hkv, T, D]: reinterpret the B=1 axis as L=1
        k_full, v_full = k_cache, v_cache
        layer = jnp.int32(0)
    else:
        k_full, v_full = k_cache[:, 0], v_cache[:, 0]  # [L, Hkv, T, D]
    Hkv, T = k_full.shape[1], k_full.shape[2]
    G = Hq // Hkv
    assert T % BLOCK_T == 0, f"cache length {T} must be a multiple of {BLOCK_T}"

    q2 = q[0, :, 0].reshape(Hkv, G, D)
    kernel = functools.partial(_decode_attn_kernel, scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Hkv,),
            in_specs=[
                pl.BlockSpec((None, G, D), lambda h, *_: (h, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((None, G, D), lambda h, *_: (h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, BLOCK_T, D), k_cache.dtype),
                pltpu.VMEM((2, BLOCK_T, D), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        jnp.stack([jnp.asarray(pos, jnp.int32), jnp.asarray(layer, jnp.int32)]),
        q2,
        k_full,
        v_full,
    )
    return out.reshape(1, Hq, 1, D)
