"""Ablation of the B=1 talker step kernel: where do 45 us/layer go?

The production whole-step kernel (ops/talker_kernel.py) measures
~1.28 ms/frame at 0.6B int8 = 45 us/layer, vs a 19 us/layer HBM weight
-stream floor (15.7 MB int8 per layer at 819 GB/s) and a ~16 us/layer
MXU row-load floor. This experiment times stripped-down variants of the
same grid program (identical BlockSpecs, so the Pallas weight pipeline
is preserved) to attribute the gap:

  full    — the production kernel (baseline; sample=None)
  noattn  — attention replaced by a copy of q's first D lanes
            (no KV stream DMAs, no softmax): attention share
  nomlp   — gate_up/down matvecs removed: MLP share
  dma     — body writes x through; no compute reads weights.
            NOTE: Pallas may dead-code-eliminate unused block fetches,
            so 'dma' also sums each weight block into the output to
            force the fetch with minimal compute (one VPU reduce).

Each variant runs as a fused 66-step fori_loop (3-run mean after
warmup), mirrors tools/microbench.py methodology.

Usage: python tools/exp_tk_b1_ablate.py [full noattn nomlp dma]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.ops.rope import mrope_cos_sin
from qwen3tts_tpu.utils import host_init as hi
from __graft_entry__ import _flagship_06b

FRAMES = 66
PREFILL_LEN = 24
NEG_INF = -1e30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _variant_kernel(shapes, eps, block_t, variant, *refs):
    """Trimmed copy of ops/talker_kernel._talker_step_kernel (narrow form,
    wo_bf16, no sampling, no kv-quant, lps=1) with ablation switches."""
    (pos_ref, qkv_w_ref, qkv_s_ref, o_w_ref, o_s_ref, gu_w_ref, gu_s_ref,
     d_w_ref, d_s_ref, iln_ref, pln_ref, qn_ref, kn_ref,
     cos_ref, sin_ref, x_ref, offs_ref,
     k_hbm, v_hbm, h_out_ref, k_out_ref, v_out_ref,
     h_scr, kbuf, vbuf, sems) = refs
    H, D, NQ, NKV, I, B = (shapes[k] for k in ("H", "D", "NQ", "NKV", "I", "B"))
    G = NQ // NKV
    scale = D**-0.5
    step = pl.program_id(0)
    max_off = pos_ref[B]
    n_valid = (max_off + block_t - 1) // block_t

    def read(slot, blk, l):
        start = blk * block_t
        return [
            pltpu.make_async_copy(
                k_hbm.at[l, :, :, pl.ds(start, block_t), :], kbuf.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                v_hbm.at[l, :, :, pl.ds(start, block_t), :], vbuf.at[slot],
                sems.at[slot, 1]),
        ]

    if variant != "noattn":
        @pl.when(n_valid > 0)
        def _():
            for c in read(0, 0, step):
                c.start()

    @pl.when(step == 0)
    def _():
        h_scr[...] = x_ref[...]

    def rms(x, w_row):
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + eps) * w_row).astype(jnp.bfloat16)

    def mv(x, w_ref, s_ref):
        w = w_ref[0].astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return (y * s_ref[0]).astype(jnp.bfloat16)

    if variant == "dma":
        # force every weight block fetch with one cheap reduce each
        acc = (
            jnp.sum(qkv_w_ref[0][:1, :].astype(jnp.float32))
            + jnp.sum(o_w_ref[0][:1, :].astype(jnp.float32))
            + jnp.sum(gu_w_ref[0][:1, :].astype(jnp.float32))
            + jnp.sum(d_w_ref[0][:1, :].astype(jnp.float32))
        )
        h_scr[...] = h_scr[...] + acc.astype(jnp.bfloat16)
        h_out_ref[...] = h_scr[...]
        k_out_ref[0] = jnp.zeros((B, NKV, D), jnp.bfloat16)
        v_out_ref[0] = jnp.zeros((B, NKV, D), jnp.bfloat16)
        for c in read(0, 0, step):
            c.wait()
        return

    cos_row = cos_ref[...].astype(jnp.bfloat16)[:, None]
    sin_row = sin_ref[...].astype(jnp.bfloat16)[:, None]

    def rope(x):
        half = D // 2
        rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        return x * cos_row + rot * sin_row

    offs = offs_ref[:, :1].reshape(B, 1, 1, 1)

    h = h_scr[...]
    xn = rms(h, iln_ref[0])
    qkv = mv(xn, qkv_w_ref, qkv_s_ref)
    q = qkv[:, : NQ * D].reshape(B, NQ, D)
    k = qkv[:, NQ * D : (NQ + NKV) * D].reshape(B, NKV, D)
    v = qkv[:, (NQ + NKV) * D :].reshape(B, NKV, D)
    q = rope(rms(q, qn_ref[0]))
    k = rope(rms(k, kn_ref[0]))
    k_out_ref[0] = k
    v_out_ref[0] = v

    if variant == "noattn":
        attn = q.reshape(B, NQ * D)
    else:
        qg = (q.astype(jnp.float32) * scale).reshape(B, NKV, G, D)
        m0 = jnp.full((B, NKV, G, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((B, NKV, G, 1), jnp.float32)
        a0 = jnp.zeros((B, NKV, G, D), jnp.float32)

        def body(b, carry):
            m, s_l, acc = carry
            slot = jax.lax.rem(b, 2)

            @pl.when(b + 1 < n_valid)
            def _():
                for c in read(1 - slot, b + 1, step):
                    c.start()

            for c in read(slot, b, step):
                c.wait()
            k_blk = kbuf[slot].astype(jnp.float32).reshape(B * NKV, block_t, D)
            v_blk = vbuf[slot].astype(jnp.float32).reshape(B * NKV, block_t, D)
            s = jax.lax.dot_general(
                qg.reshape(B * NKV, G, D), k_blk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(B, NKV, G, block_t)
            t_idx = b * block_t + jax.lax.broadcasted_iota(
                jnp.int32, (B, NKV, G, block_t), 3)
            s = jnp.where(t_idx < offs, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            s_l = s_l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.reshape(B * NKV, G, block_t), v_blk, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(B, NKV, G, D)
            return m_new, s_l, acc

        m, s_l, acc = jax.lax.fori_loop(0, n_valid, body, (m0, l0, a0))
        s_cur = jax.lax.dot_general(
            qg.reshape(B * NKV, G, D), k.astype(jnp.float32).reshape(B * NKV, D),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(B, NKV, G, 1)
        m_f = jnp.maximum(m, s_cur)
        alpha = jnp.exp(m - m_f)
        p_cur = jnp.exp(s_cur - m_f)
        s_l = s_l * alpha + p_cur
        acc = acc * alpha + p_cur * v.astype(jnp.float32)[:, :, None, :]
        attn = (acc / s_l).astype(jnp.bfloat16).reshape(B, NQ * D)

    h = h + mv(attn, o_w_ref, o_s_ref)
    if variant == "nomlp":
        h_scr[...] = h
        h_out_ref[...] = h
        return
    xn = rms(h, pln_ref[0])
    gu = mv(xn, gu_w_ref, gu_s_ref).astype(jnp.float32)
    g, u = gu[:, :I], gu[:, I:]
    gated = (g * jax.nn.sigmoid(g) * u).astype(jnp.bfloat16)
    h = h + mv(gated, d_w_ref, d_s_ref)
    h_scr[...] = h
    h_out_ref[...] = h


def variant_step(params, cfg, x, k_cache, v_cache, pos, cos, sin, variant):
    from qwen3tts_tpu.ops.talker_kernel import _pick_block_t, _shapes, _wq

    B = x.shape[0]
    s = _shapes(cfg)
    s["B"] = B
    L, H, D, NKV, NQ, I = s["L"], s["H"], s["D"], s["NKV"], s["NQ"], s["I"]
    T = k_cache.shape[3]
    block_t = _pick_block_t(T, B, NKV, D)
    layers = params["layers"]
    offs_arr = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))

    def nrm(w):
        return w.astype(jnp.float32)[:, None, :]

    kernel = functools.partial(
        _variant_kernel, s, float(cfg.rms_norm_eps), block_t, variant)
    blk = lambda shape: pl.BlockSpec(
        (1,) + shape[1:], lambda l: (l,) + (0,) * (len(shape) - 1))
    const = lambda shape: pl.BlockSpec(shape, lambda l: (0,) * len(shape))
    qkv_w, qkv_s = _wq(layers["qkv_proj"])
    o_w, o_s = _wq(layers["o_proj"])
    gu_w, gu_s = _wq(layers["gate_up_proj"])
    d_w, d_s = _wq(layers["down_proj"])
    in_specs = [
        blk((1, H, qkv_w.shape[-1])), blk((1, 1, qkv_w.shape[-1])),
        blk((1, NQ * D, H)), blk((1, 1, H)),
        blk((1, H, 2 * I)), blk((1, 1, 2 * I)),
        blk((1, I, H)), blk((1, 1, H)),
        blk((1, 1, H)), blk((1, 1, H)), blk((1, 1, D)), blk((1, 1, D)),
        const((B, D)), const((B, D)), const((B, H)), const((B, 128)),
    ]
    operands = [
        qkv_w, qkv_s, o_w, o_s, gu_w, gu_s, d_w, d_s,
        nrm(layers["input_layernorm"]), nrm(layers["post_attention_layernorm"]),
        nrm(layers["q_norm"]), nrm(layers["k_norm"]),
        cos[:, 0].astype(jnp.float32), sin[:, 0].astype(jnp.float32),
        x[:, 0].astype(jnp.bfloat16),
        jnp.broadcast_to(offs_arr[:, None], (B, 128)),
    ]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L,),
            in_specs=in_specs + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=[
                const((B, H)), blk((1, B, NKV, D)), blk((1, B, NKV, D)),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.bfloat16),
                pltpu.VMEM((2, B, NKV, block_t, D), jnp.bfloat16),
                pltpu.VMEM((2, B, NKV, block_t, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, NKV, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, NKV, D), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 2**20,
        ),
    )(jnp.concatenate([offs_arr, jnp.max(offs_arr)[None]]), *operands,
      k_cache, v_cache)
    return out[0][:, None], out[1], out[2]


def main():
    which = sys.argv[1:] or ["full", "noattn", "nomlp", "dma"]
    cfg = _flagship_06b()
    h = cfg.hidden_size

    t0 = time.time()
    tp = hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16)
    tp = dict(tp)
    tp["layers"] = tk.fuse_layer_projections(tp["layers"])
    tp = quantize_decode_params_int8(tp, "codec_head")
    jax.block_until_ready(tp["norm"])
    log(f"param init: {time.time() - t0:.1f}s")

    cache_len = 256
    cache = tk.make_cache(cfg, 1, cache_len, jnp.bfloat16)

    def run_variant(name):
        if name == "full":
            from qwen3tts_tpu.ops.talker_kernel import talker_decode_step

            def step(params, x, kc, vc, off, cos, sin):
                return talker_decode_step(
                    params, cfg, x, kc, vc, off, cos, sin, mode="wo_bf16")
        else:
            def step(params, x, kc, vc, off, cos, sin):
                return variant_step(params, cfg, x, kc, vc, off, cos, sin, name)

        @jax.jit
        def loop(params, kc, vc):
            x0 = jnp.zeros((1, 1, h), jnp.bfloat16)

            def body(i, carry):
                x, kc, vc, off = carry
                pos = jnp.broadcast_to(off[None, None], (1, 1)).astype(jnp.int32)
                cos, sin = mrope_cos_sin(
                    pos, cfg.head_dim, cfg.rope_theta, cfg.mrope_section,
                    jnp.bfloat16)
                hh, k_new, v_new = step(params, x, kc, vc, off, cos, sin)
                kc = jax.lax.dynamic_update_slice(
                    kc, k_new[:, :, :, None, :], (0, 0, 0, off, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, v_new[:, :, :, None, :], (0, 0, 0, off, 0))
                return hh.astype(jnp.bfloat16), kc, vc, off + 1

            x, kc, vc, _ = jax.lax.fori_loop(
                0, FRAMES, body, (x0, kc, vc, jnp.int32(PREFILL_LEN)))
            return x

        t0 = time.time()
        y = loop(tp, cache.k, cache.v)
        jax.block_until_ready(y)
        compile_s = time.time() - t0
        t0 = time.time()
        n = 3
        for _ in range(n):
            y = loop(tp, cache.k, cache.v)
            jax.block_until_ready(y)
        dt = (time.time() - t0) / n
        log(f"{name:8s} x{FRAMES}: {dt * 1e3:7.1f} ms total, "
            f"{dt / FRAMES * 1e3:6.3f} ms/frame, "
            f"{dt / FRAMES / cfg.num_hidden_layers * 1e6:5.1f} us/layer "
            f"(compile {compile_s:.0f}s)")

    for name in which:
        run_variant(name)


if __name__ == "__main__":
    main()
