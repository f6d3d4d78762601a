"""Packed-int4 matvec: can any layout/compute strategy beat the 0.108 RTF?

Round-4 verdict #10. The shipped Pallas dequant-in-matmul kernel
(ops/quant.py::quant_matmul_pallas) computes the whole matvec on the VPU:
per packed word, 8 x (shift, mask, cast, fma) — one fma per nibble, i.e.
O*I VPU fmas. Round 3 measured it VPU-bound (RTF 0.108). Two hypotheses:

  (b) nibble-PLANE repack: weights pre-split so value k pairs with value
      k + I/2 in one byte — unpack becomes mask-only/shift-only over
      contiguous halves, no lane interleave. NOTE the shipped kernel
      already avoids interleaves by pre-striding x, so this tests whether
      the extraction pattern (not shuffles) matters.
  (c) dequant-to-bf16 THEN MXU: VPU does ~3 ops/nibble to materialize a
      bf16 tile, the MXU does the actual matmul. Qualitatively different:
      the fma moves off the VPU.

Measures all three at the 0.6B talker matvec shapes. If neither (b) nor
(c) wins materially, the VPU extraction-op floor is the refutation (the
unpack math, not the layout, is the bound).

Usage: python tools/exp_int4_repack.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen3tts_tpu.ops.quant import pack_quantized, quant_matmul_pallas

GROUP = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---- (c) dequant-to-bf16 then MXU ----------------------------------------
def _mxu_kernel(bits: int, group: int, x_ref, w_ref, s_ref, b_ref, o_ref):
    per_word = 32 // bits
    mask = (1 << bits) - 1
    w = pltpu.bitcast(w_ref[...], jnp.int32)  # [O_t, W]
    x = x_ref[...]  # [1, I] f32
    O_t, W = w.shape
    # materialize dequantized bf16 tile column-block by column-block:
    # [O_t, I] = concat over j of ((w >> 4j) & mask) -> the j-strided
    # input positions; matmul against the matching x stride.
    acc = jnp.zeros((1, O_t), jnp.float32)
    for j in range(per_word):
        qj = ((w >> (bits * j)) & mask).astype(jnp.bfloat16)  # [O_t, W]
        xj = x[j][None]  # static row index (python loop)
        acc = acc + jax.lax.dot_general(
            xj.astype(jnp.bfloat16), qj,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    # affine correction: y += sum_g b[o,g]*XS[g]; scale applied per group
    # needs grouped partial sums — for the EXPERIMENT we apply a single
    # per-row scale approximation (timing-faithful, numerics not)
    o_ref[...] = acc * s_ref[..., :1].T + (b_ref[...].sum(-1))[None]


@functools.partial(jax.jit, static_argnames=("bits", "group", "block_o"))
def mxu_variant(x, packed, scales, biases, bits=4, group=64, block_o=256):
    per_word = 32 // bits
    O, W = packed.shape
    I = W * per_word
    x_strided = x.reshape(W, per_word).T.astype(jnp.float32)  # [pw, W]
    kernel = functools.partial(_mxu_kernel, bits, group)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, O), jnp.float32),
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((per_word, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, scales.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, biases.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(x_strided, packed, scales, biases)


# ---- (b) plane repack: halve extraction ops (mask OR shift, not both) ----
def _plane_kernel(x_ref, lo_ref, hi_ref, s_ref, o_ref):
    # lo/hi are uint32 words each holding 8 nibbles of CONTIGUOUS values
    # (value k and k + I/2 were split at repack time); extraction per j is
    # one shift + one mask as before, but x needs no striding at all and
    # each half-matrix is a plain contiguous matvec. Tests whether layout
    # (vs op count) moves the needle.
    lo = pltpu.bitcast(lo_ref[...], jnp.int32)
    hi = pltpu.bitcast(hi_ref[...], jnp.int32)
    x = x_ref[...]  # [16, W] pre-strided: rows 0..7 first half, 8..15 second
    acc = jnp.zeros(lo.shape, jnp.float32)
    for j in range(8):
        acc = acc + ((lo >> (4 * j)) & 15).astype(jnp.float32) * x[j][None]
        acc = acc + ((hi >> (4 * j)) & 15).astype(jnp.float32) * x[8 + j][None]
    o_ref[...] = acc.sum(-1, keepdims=True).T * s_ref[..., :1].T


@functools.partial(jax.jit, static_argnames=("block_o",))
def plane_variant(x, lo, hi, scales, block_o=256):
    O, W = lo.shape
    xs = x.reshape(2, W, 8).transpose(0, 2, 1).reshape(16, W).astype(jnp.float32)
    return pl.pallas_call(
        _plane_kernel,
        out_shape=jax.ShapeDtypeStruct((1, O), jnp.float32),
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((16, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, scales.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(xs, lo, hi, scales)


import numpy as _np


def timeit_loop(fn_of_x, x, n=200):
    """Amortized in-program timing: per-dispatch tunnel latency (~1 ms)
    dwarfs a single matvec, and block_until_ready is unreliable here —
    run the variant n times inside one fori_loop with a fake data
    dependency (x + acc*0) so XLA can't hoist it, and sync via a scalar
    readback."""

    @jax.jit
    def loop(xv):
        def body(i, acc):
            y = fn_of_x(xv + acc * 0)
            return acc + y.astype(jnp.float32).sum() * 1e-20

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    _np.asarray(loop(x))  # compile+warm
    t0 = time.time()
    _np.asarray(loop(x))
    dt1 = time.time() - t0
    t0 = time.time()
    _np.asarray(loop(x))
    return min(dt1, time.time() - t0) / n


def main():
    rng = np.random.default_rng(0)
    # 0.6B talker decode matvec shapes (fused): qkv [1024->2048ish],
    # o [1024->1024], gate_up [1024->6144], down [3072->1024] — representative
    shapes = [(1024, 3072), (3072, 1024), (1024, 6144), (1024, 2048)]
    total = {"packed": 0.0, "plane": 0.0, "mxu": 0.0}
    for I, O in shapes:
        w = rng.standard_normal((O, I)).astype(np.float32) * 0.02
        packed, scales, biases = pack_quantized(w, 4, GROUP)
        packed = jnp.asarray(packed)
        scales_j, biases_j = jnp.asarray(scales), jnp.asarray(biases)
        x = jnp.asarray(rng.standard_normal((1, I)).astype(np.float32))

        t_packed = timeit_loop(lambda xv: quant_matmul_pallas(
            xv, packed, scales_j, biases_j, 4, GROUP), x)

        # plane repack: value k pairs with k + I/2
        q = np.zeros((O, I), np.uint32)
        per_word = 8
        for j in range(per_word):
            q[:, j::per_word] |= 0  # placeholder; repack from packed words
        # unpack host-side then repack planes
        qv = np.zeros((O, I), np.uint32)
        pw = np.asarray(packed)
        for j in range(per_word):
            qv[:, j::per_word] = (pw >> (4 * j)) & 15
        half = I // 2
        lo_vals, hi_vals = qv[:, :half], qv[:, half:]
        lo = np.zeros((O, half // 8), np.uint32)
        hi = np.zeros((O, half // 8), np.uint32)
        for j in range(8):
            lo |= lo_vals[:, j::8] << (4 * j)
            hi |= hi_vals[:, j::8] << (4 * j)
        lo, hi = jnp.asarray(lo), jnp.asarray(hi)
        t_plane = timeit_loop(
            lambda xv: plane_variant(xv, lo, hi, scales_j), x)

        t_mxu = timeit_loop(
            lambda xv: mxu_variant(xv, packed, scales_j, biases_j), x)

        log(f"I={I:5d} O={O:5d}: packed {t_packed*1e6:7.1f} us | "
            f"plane {t_plane*1e6:7.1f} us | mxu {t_mxu*1e6:7.1f} us")
        total["packed"] += t_packed
        total["plane"] += t_plane
        total["mxu"] += t_mxu
    log(f"per-layer totals: packed {total['packed']*1e6:.1f} us, "
        f"plane {total['plane']*1e6:.1f} us, mxu {total['mxu']*1e6:.1f} us "
        f"(x28 layers = {total['packed']*28*1e3:.2f} / "
        f"{total['plane']*28*1e3:.2f} / {total['mxu']*28*1e3:.2f} ms/frame)")
    print({k: round(v * 1e6, 1) for k, v in total.items()})


if __name__ == "__main__":
    main()
