"""Mosaic feasibility probes for the CP megakernel (run on the real chip).

Each probe is a tiny pallas_call testing one lowering question:
  P1 reshape (1, 2048) -> (16, 128)            (lane -> sublane)
  P2 s8 x s8 -> s32 MXU dot (1,1024)x(1024,2048)
  P3 dynamic-row store into VMEM scratch + dynamic-row read
  P4 scalar extraction (argmax) -> SMEM output + use as pl.ds DMA index
  P5 prng_seed / prng_random_bits
  P6 int8 -> bf16 convert of a large VMEM operand + bf16 dot
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        log(f"PASS {name}: {np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:
        log(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        return False


def p1_reshape():
    def k(x_ref, o_ref):
        x = x_ref[...]  # (1, 2048)
        y = x.reshape(16, 128)
        o_ref[...] = y * 2.0

    x = jnp.arange(2048, dtype=jnp.float32).reshape(1, 2048)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32)
    )(x)


def p2_int8_dot():
    def k(x_ref, w_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[...] = acc

    x = jnp.ones((1, 1024), jnp.int8)
    w = jnp.ones((1024, 2048), jnp.int8)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 2048), jnp.int32)
    )(x, w)


def p3_dynrow():
    def k(p_ref, x_ref, o_ref, buf):
        p = p_ref[0]
        buf[pl.ds(p, 1), :] = x_ref[...] * 3.0
        o_ref[...] = buf[pl.ds(p, 1), :]

    x = jnp.ones((1, 1024), jnp.bfloat16)
    return pl.pallas_call(
        functools.partial(k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((1, 1024), lambda *_: (0, 0))],
            out_specs=pl.BlockSpec((1, 1024), lambda *_: (0, 0)),
            scratch_shapes=[pltpu.VMEM((16, 1024), jnp.bfloat16)],
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.bfloat16),
    )(jnp.array([5], jnp.int32), x)


def p4_argmax_dma():
    def k(z_ref, emb_hbm, codes_ref, row_ref, buf, sem):
        z = z_ref[...]  # (1, 2048) f32
        m = jnp.max(z)
        iota = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        c = jnp.min(jnp.where(z == m, iota, 4096))
        codes_ref[0] = c
        dma = pltpu.make_async_copy(emb_hbm.at[pl.ds(c, 1), :], buf, sem)
        dma.start()
        dma.wait()
        row_ref[...] = buf[...]

    z = jnp.zeros((1, 2048), jnp.float32).at[0, 77].set(5.0)
    emb = jnp.broadcast_to(
        jnp.arange(2048, dtype=jnp.float32)[:, None], (2048, 256)
    ).copy()
    codes, row = pl.pallas_call(
        k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16,), jnp.int32),
            jax.ShapeDtypeStruct((1, 256), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 256), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(z, emb)
    return codes[:1], row[0, :1]  # expect 77, 77.0


def p5_prng():
    def k(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        bits = pltpu.prng_random_bits((1, 2048))
        u = (bits >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / (1 << 24))
        o_ref[...] = u

    u = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=jax.ShapeDtypeStruct((1, 2048), jnp.float32),
    )(jnp.array([123], jnp.int32))
    return jnp.array([u.mean(), u.min(), u.max()])


def p6_convert_dot():
    def k(x_ref, w_ref, o_ref):
        w = w_ref[...].astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            x_ref[...], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = acc

    x = jnp.ones((1, 1024), jnp.bfloat16)
    w = jnp.ones((1024, 3072), jnp.int8)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 3072), jnp.float32)
    )(x, w)


def main():
    which = sys.argv[1:] or ["p1", "p2", "p3", "p4", "p5", "p6"]
    fns = dict(p1=p1_reshape, p2=p2_int8_dot, p3=p3_dynrow,
               p4=p4_argmax_dma, p5=p5_prng, p6=p6_convert_dot)
    for extra in ("p3a", "p3b", "p3c", "p4a", "p4b"):
        fns[extra] = _mk(extra)
    fns["p4c"] = p4c_run
    for name in which:
        probe(name, fns[name])




def _mk(name):
    # appended bisect probes
    if name == "p3a":  # f32 dynamic-row store, full-buffer readback
        def k(p_ref, x_ref, o_ref, buf):
            p = p_ref[0]
            buf[pl.ds(p, 1), :] = x_ref[...] * 3.0
            o_ref[...] = buf[...]

        def run():
            x = jnp.ones((1, 1024), jnp.float32)
            return pl.pallas_call(
                k,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(1,),
                    in_specs=[pl.BlockSpec((1, 1024), lambda *_: (0, 0))],
                    out_specs=pl.BlockSpec((16, 1024), lambda *_: (0, 0)),
                    scratch_shapes=[pltpu.VMEM((16, 1024), jnp.float32)],
                ),
                out_shape=jax.ShapeDtypeStruct((16, 1024), jnp.float32),
            )(jnp.array([5], jnp.int32), x)
        return run
    if name == "p3b":  # bf16 dynamic-row store
        def k(p_ref, x_ref, o_ref, buf):
            p = p_ref[0]
            buf[pl.ds(p, 1), :] = x_ref[...] * 3.0
            o_ref[...] = buf[...]

        def run():
            x = jnp.ones((1, 1024), jnp.bfloat16)
            return pl.pallas_call(
                k,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(1,),
                    in_specs=[pl.BlockSpec((1, 1024), lambda *_: (0, 0))],
                    out_specs=pl.BlockSpec((16, 1024), lambda *_: (0, 0)),
                    scratch_shapes=[pltpu.VMEM((16, 1024), jnp.bfloat16)],
                ),
                out_shape=jax.ShapeDtypeStruct((16, 1024), jnp.bfloat16),
            )(jnp.array([5], jnp.int32), x)
        return run
    if name == "p3c":  # where-mask row update, bf16
        def k(p_ref, x_ref, o_ref, buf):
            p = p_ref[0]
            rows = jax.lax.broadcasted_iota(jnp.int32, (16, 1024), 0)
            upd = jnp.broadcast_to(x_ref[...] * 3.0, (16, 1024))
            buf[...] = jnp.where(rows == p, upd, buf[...])
            o_ref[...] = buf[...]

        def run():
            x = jnp.ones((1, 1024), jnp.bfloat16)
            return pl.pallas_call(
                k,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(1,),
                    in_specs=[pl.BlockSpec((1, 1024), lambda *_: (0, 0))],
                    out_specs=pl.BlockSpec((16, 1024), lambda *_: (0, 0)),
                    scratch_shapes=[pltpu.VMEM((16, 1024), jnp.bfloat16)],
                ),
                out_shape=jax.ShapeDtypeStruct((16, 1024), jnp.bfloat16),
            )(jnp.array([5], jnp.int32), x)
        return run
    if name == "p4a":  # scalar extraction -> SMEM output
        def k(z_ref, codes_ref):
            z = z_ref[...]
            m = jnp.max(z)
            iota = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
            c = jnp.min(jnp.where(z == m, iota, 4096))
            codes_ref[0] = c

        def run():
            z = jnp.zeros((1, 2048), jnp.float32).at[0, 77].set(5.0)
            return pl.pallas_call(
                k,
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((16,), jnp.int32),
            )(z)
        return run
    if name == "p4b":  # DMA row at computed scalar index (no SMEM out)
        def k(z_ref, emb_hbm, row_ref, buf, sem):
            z = z_ref[...]
            m = jnp.max(z)
            iota = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
            c = jnp.min(jnp.where(z == m, iota, 4096))
            dma = pltpu.make_async_copy(emb_hbm.at[pl.ds(c, 1), :], buf, sem)
            dma.start()
            dma.wait()
            row_ref[...] = buf[...]

        def run():
            z = jnp.zeros((1, 2048), jnp.float32).at[0, 77].set(5.0)
            emb = jnp.broadcast_to(
                jnp.arange(2048, dtype=jnp.float32)[:, None], (2048, 256)
            ).copy()
            return pl.pallas_call(
                k,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, 256), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((1, 256), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
            )(z, emb)
        return run
    raise KeyError(name)


import sys as _sys
if _sys.argv[1:] and _sys.argv[1].startswith("p3") or (_sys.argv[1:] and _sys.argv[1].startswith("p4") and _sys.argv[1] not in ("p3", "p4")):
    pass





def p4c_run():
    # vector-derived scalar -> SMEM scratch round-trip -> DMA index
    def k(z_ref, emb_hbm, row_ref, buf, ssc, sem):
        z = z_ref[...]
        m = jnp.max(z)
        iota = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        c = jnp.min(jnp.where(z == m, iota, 4096))
        ssc[0] = c
        c2 = ssc[0]
        dma = pltpu.make_async_copy(emb_hbm.at[pl.ds(c2, 1), :], buf, sem)
        dma.start()
        dma.wait()
        row_ref[...] = buf[...]

    z = jnp.zeros((1, 2048), jnp.float32).at[0, 77].set(5.0)
    emb = jnp.broadcast_to(
        jnp.arange(2048, dtype=jnp.float32)[:, None], (2048, 256)
    ).copy()
    return pl.pallas_call(
        k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 256), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, 256), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )(z, emb)


if __name__ == "__main__":
    main()
