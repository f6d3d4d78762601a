"""Fused talker decode step: all 28 layers as ONE Pallas grid program.

After the CP kernel landed, the talker step dominates the frame
(1.50 of 2.54 ms on v5e, tools/microbench.py). The XLA scan-over-layers
path runs ~9 ops/layer and gives the compiler no way to prefetch the next
layer's weights while the current layer computes — each int8 matvec stalls
on its own HBM read (~19 us/layer of weight traffic, measured ~51 us/layer
end-to-end).

This kernel runs the whole step as ``grid=(L/lps,)`` (lps layers per
step, default 1; ``QWEN3TTS_TK_LPS=2`` doubles the weight-DMA
granularity): the per-layer int8 weight blocks (fused qkv / o / gate_up
/ down, the production serving layout) are BlockSpec-indexed by the grid
step, so Pallas double-buffers the HBM->VMEM weight stream automatically
— the next layers' weights fly in while the current ones compute. The
residual stream rides a VMEM scratch across grid steps. Attention
streams only the VALID cache prefix through a double-buffered block
pipeline with flash-style online softmax (the XLA path reads the full
T_max rows every step), and the current token's k/v join the softmax as
a final virtual block. Two score/value formulations: the narrow
[B*NKV]-batched form (the default at every batch size), and an opt-in
grouped-wide form (``QWEN3TTS_TK_WIDE_SG``) that trades SG*NKV x wasted
FLOPs for 128-row MXU tile-load amortization. The tile-load cost model
(tools/exp_attn_cost.py: 2.13 ms/frame per extra streamed KV block at
B=32) predicted wide would win at batch; the 2026-08-18 hardware A/B
measured narrow FASTER at B=8/16/32 for every SG in {1,2,4,8} — see
``_pick_wide_sg`` for the numbers. The new k/v
rows are returned stacked [L, Hkv, D] so the caller appends them with
ONE dynamic_update_slice per cache (the round-1 finding stands:
single-row VMEM->HBM bf16 DMAs violate Mosaic sublane tiling).

Matmul modes (static, same semantics as ops/cp_kernel.py):
  * "wo_bf16":  weight-only int8 -> bf16 convert per matvec (default;
    numerically matches the XLA Int8Linear path).
  * "dyn_int8": per-matvec activation quant, s8 x s8 -> s32 MXU.

Scope: S=1 decode with fused projections (Int8Linear or dense bf16) on
TPU, any static batch B — single-stream serving (B=1) and the lockstep
batched decoder (per-sequence cache offsets, B>1), both with optional
in-kernel codec-head sampling (row-parallel code0 sampler fused into the
last grid step). Everything else stays on the XLA scan path
(models/talker.py:forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _talker_step_kernel(
    shapes: dict,
    mode: str,
    eps: float,
    block_t: int,
    sample: dict | None,  # static: temperature/top_k/rep_penalty/eos_id
    kv_quant: bool,  # int8 cache + per-row f32 scale stream
    wide_sg: int,  # >0: grouped-wide attention, wide_sg sequences per group
    lps: int,  # layers per grid step (block dim of the weight stream)
    *refs,
):
    """Kernel body. ``refs`` layout (sampling refs only present when
    ``sample`` is not None; works for any static B):

      scalar prefetch:
        pos_ref  SMEM [B+1(+2)] int32: per-seq cache offsets, max offset,
                 [seed0, seed1 — sampling only]
      blocked per-layer inputs (leading dim = this grid step's lps layers):
        qkv_w, qkv_s   [lps, H, NQD+2KVD] int8 / [lps, 1, ...] f32
        o_w, o_s       [lps, NQD, H]
        gu_w, gu_s     [lps, H, 2I]
        d_w, d_s       [lps, I, H]
        iln, pln       [lps, 1, H] f32
        qn, kn         [lps, 1, D] f32
      unblocked inputs:
        cos, sin       [B, D] f32 (per-seq rope rows at its offset)
        x              [B, H] bf16 input embeddings
        offs           [B, 128] int32 (per-seq offset broadcast on lanes)
        [offs_rows     [B*NQ, 128] int32, row r = offs[r // NQ] — wide only]
        [head_w        [H, V] int8      — sampling only]
        [head_s        [1, V] f32       — sampling only]
        [fnorm         [1, H] f32       — sampling only]
        [supp          [1, V] f32 additive mask, shared rows — sampling only]
        [seen          [B, V] f32 1.0=seen — sampling only]
        k_hbm, v_hbm   ANY [L, B, Hkv, T, D] bf16 (b rows 0..offs[b]-1 valid)
      outputs:
        h_out          [B, H] bf16 (pre final-norm; post-norm when sampling)
        k_out, v_out   blocked [1, B, Hkv, D] bf16 per layer
        [code_out      [B, 128] int32, lane 0 = sampled code — sampling only]
      scratch:
        h_scr VMEM [B, H] bf16, kbuf/vbuf VMEM [2, B, Hkv, block_t, D] bf16,
        sems DMA (2, 2)
    """
    r = list(refs)
    pos_ref = r.pop(0)
    (qkv_w_ref, qkv_s_ref, o_w_ref, o_s_ref, gu_w_ref, gu_s_ref,
     d_w_ref, d_s_ref, iln_ref, pln_ref, qn_ref, kn_ref,
     cos_ref, sin_ref, x_ref, offs_ref) = r[:16]
    del r[:16]
    if wide_sg > 0:
        offs_rows_ref = r.pop(0)  # [B*NQ, 128]: row r = offs[r // NQ]
    if sample is not None:
        head_w_ref, head_s_ref, fnorm_ref, supp_ref, seen_ref = r[:5]
        del r[:5]
    k_hbm, v_hbm = r[:2]
    del r[:2]
    if kv_quant:
        ks_hbm, vs_hbm = r[:2]
        del r[:2]
    h_out_ref, k_out_ref, v_out_ref = r[:3]
    del r[:3]
    if sample is not None:
        code_out_ref = r.pop(0)
    h_scr, kbuf, vbuf = r[:3]
    del r[:3]
    if kv_quant:
        ksbuf, vsbuf = r[:2]
        del r[:2]
    (sems,) = r
    H, D, NQ, NKV, I, B = (
        shapes[k] for k in ("H", "D", "NQ", "NKV", "I", "B")
    )
    G = NQ // NKV
    scale = D**-0.5
    step = pl.program_id(0)
    max_off = pos_ref[B]  # max over per-seq offsets
    T = k_hbm.shape[3]
    n_valid = (max_off + block_t - 1) // block_t  # prefix blocks to stream

    def read(slot, blk, l):
        start = blk * block_t
        cps = [
            pltpu.make_async_copy(
                k_hbm.at[l, :, :, pl.ds(start, block_t), :], kbuf.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[l, :, :, pl.ds(start, block_t), :], vbuf.at[slot],
                sems.at[slot, 1],
            ),
        ]
        if kv_quant:
            cps += [
                pltpu.make_async_copy(
                    ks_hbm.at[l, :, :, pl.ds(start, block_t)], ksbuf.at[slot],
                    sems.at[slot, 2],
                ),
                pltpu.make_async_copy(
                    vs_hbm.at[l, :, :, pl.ds(start, block_t)], vsbuf.at[slot],
                    sems.at[slot, 3],
                ),
            ]
        return cps

    @pl.when(n_valid > 0)
    def _():
        for c in read(0, 0, step * lps):
            c.start()

    @pl.when(step == 0)
    def _():
        h_scr[...] = x_ref[...]

    def rms(x, w_row):
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + eps) * w_row).astype(jnp.bfloat16)

    def mv(x, w_ref, s_ref, j=0):
        if mode == "dyn_int8":
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            s = jnp.maximum(amax * (1.0 / 127.0), 1e-12)
            xq = jnp.round(xf / s).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, w_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * (s * s_ref[j])
        elif mode == "bf16":  # dense bf16 weights, no scale
            y = jax.lax.dot_general(
                x, w_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:  # "wo_bf16": int8 weights converted on load, per-channel scale
            w = w_ref[j].astype(jnp.bfloat16)
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            y = y * s_ref[j]
        return y.astype(jnp.bfloat16)

    cos_row = cos_ref[...].astype(jnp.bfloat16)[:, None]  # [B, 1, D]
    sin_row = sin_ref[...].astype(jnp.bfloat16)[:, None]

    def rope(x):  # [B, Hh, D]
        half = D // 2
        rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        return x * cos_row + rot * sin_row

    # grouped-wide attention constants (layer-independent, hoisted)
    if wide_sg > 0:
        SG = wide_sg
        NGRP = B // SG
        M = SG * NQ  # wide query rows per group
        R = SG * NKV * block_t  # wide key rows per group
        # structural mask: query row i (seq i//NQ, kv head (i%NQ)//G) may
        # attend key row j (seq j//(NKV*bt), kv head (j//bt)%NKV) iff both
        # match; identical for every group, layer and block -> built once
        qi = jax.lax.broadcasted_iota(jnp.int32, (M, R), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (M, R), 1)
        struct_add = jnp.where(
            (qi // NQ == kj // (NKV * block_t))
            & ((qi % NQ) // G == (kj // block_t) % NKV),
            0.0,
            NEG_INF,
        )
        col_t = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1) % block_t

    offs = offs_ref[:, :1].reshape(B, 1, 1, 1)  # per-seq valid length

    def run_layer(j, l, h):
        """One transformer layer: j = slot in this grid step's weight
        block, l = absolute layer index (for the KV stream)."""
        xn = rms(h, iln_ref[j])
        qkv = mv(xn, qkv_w_ref, qkv_s_ref, j)  # [B, NQD + 2 KVD]
        q = qkv[:, : NQ * D].reshape(B, NQ, D)
        k = qkv[:, NQ * D : (NQ + NKV) * D].reshape(B, NKV, D)
        v = qkv[:, (NQ + NKV) * D :].reshape(B, NKV, D)
        q = rope(rms(q, qn_ref[j]))
        k = rope(rms(k, kn_ref[j]))
        k_out_ref[j] = k
        v_out_ref[j] = v

        # --- prefix-streaming flash attention + current-token block ---
        qg = (q.astype(jnp.float32) * scale).reshape(B, NKV, G, D)

        if wide_sg > 0:
            # Grouped-wide form: one [SG*NQ, D] x [SG*NKV*bt, D]^T matmul
            # per group of SG sequences. The narrow form's [B*NKV]-batched
            # [G=2, D]x[D, bt] sub-matmuls pay a full 128-row MXU tile load
            # for 2 rows of use (measured tile-load bound: ~2.1 ms/frame
            # per extra streamed KV block at B=32, tools/exp_attn_cost.py);
            # the wide form wastes SG*NKV x the FLOPs on cross-sequence /
            # cross-head entries (masked to -inf structurally) but
            # amortizes every tile load over 128 query rows — the same
            # trade that took the CP kernel's batched attention 1.96 ->
            # 1.0 ms/frame.
            qw = qg.reshape(B * NQ, D)
            m0 = tuple(
                jnp.full((M, 1), NEG_INF, jnp.float32) for _ in range(NGRP)
            )
            l0 = tuple(jnp.zeros((M, 1), jnp.float32) for _ in range(NGRP))
            a0 = tuple(jnp.zeros((M, D), jnp.float32) for _ in range(NGRP))

            def body(b, carry):
                ms, ls, accs = carry
                slot = jax.lax.rem(b, 2)

                @pl.when(b + 1 < n_valid)
                def _():
                    for c in read(1 - slot, b + 1, l):
                        c.start()

                for c in read(slot, b, l):
                    c.wait()
                t_j = b * block_t + col_t  # [1, R] absolute key time
                ms_n, ls_n, accs_n = [], [], []
                for g in range(NGRP):  # unrolled: bounds live VMEM to 1 grp
                    m, s_l, acc = ms[g], ls[g], accs[g]
                    k_g = kbuf[slot][g * SG : (g + 1) * SG].astype(
                        jnp.float32
                    ).reshape(R, D)
                    v_g = vbuf[slot][g * SG : (g + 1) * SG].astype(
                        jnp.float32
                    ).reshape(R, D)
                    s = jax.lax.dot_general(
                        qw[g * M : (g + 1) * M], k_g,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [M, R]
                    if kv_quant:
                        s = s * ksbuf[slot][g * SG : (g + 1) * SG].reshape(1, R)
                    offs_g = offs_rows_ref[g * M : (g + 1) * M, :1]  # [M, 1]
                    s = jnp.where(t_j < offs_g, s + struct_add, NEG_INF)
                    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                    p = jnp.exp(s - m_new)
                    alpha = jnp.exp(m - m_new)
                    s_l = s_l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                    if kv_quant:
                        p = p * vsbuf[slot][g * SG : (g + 1) * SG].reshape(1, R)
                    acc = acc * alpha + jax.lax.dot_general(
                        p, v_g, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [M, D]
                    ms_n.append(m_new)
                    ls_n.append(s_l)
                    accs_n.append(acc)
                return tuple(ms_n), tuple(ls_n), tuple(accs_n)

            ms, ls, accs = jax.lax.fori_loop(0, n_valid, body, (m0, l0, a0))
            # back to the narrow [B, NKV, G, *] layout for the shared tail
            m = jnp.concatenate(ms, axis=0).reshape(B, NKV, G, 1)
            s_l = jnp.concatenate(ls, axis=0).reshape(B, NKV, G, 1)
            acc = jnp.concatenate(accs, axis=0).reshape(B, NKV, G, D)
        else:
            m0 = jnp.full((B, NKV, G, 1), NEG_INF, jnp.float32)
            l0 = jnp.zeros((B, NKV, G, 1), jnp.float32)
            a0 = jnp.zeros((B, NKV, G, D), jnp.float32)

            def body(b, carry):
                m, s_l, acc = carry
                slot = jax.lax.rem(b, 2)

                @pl.when(b + 1 < n_valid)
                def _():
                    for c in read(1 - slot, b + 1, l):
                        c.start()

                for c in read(slot, b, l):
                    c.wait()
                # Mosaic matmuls allow at most ONE batch dim: merge (B, NKV)
                k_blk = kbuf[slot].astype(jnp.float32).reshape(
                    B * NKV, block_t, D
                )
                v_blk = vbuf[slot].astype(jnp.float32).reshape(
                    B * NKV, block_t, D
                )
                s = jax.lax.dot_general(
                    qg.reshape(B * NKV, G, D), k_blk,
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).reshape(B, NKV, G, block_t)
                if kv_quant:
                    # int8 rows: fold the per-row K scale into the scores
                    # (cheaper than dequantizing the whole [*, D] block)
                    s = s * ksbuf[slot][:, :, None, :]
                t_idx = b * block_t + jax.lax.broadcasted_iota(
                    jnp.int32, (B, NKV, G, block_t), 3
                )
                s = jnp.where(t_idx < offs, s, NEG_INF)
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m - m_new)
                s_l = s_l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                if kv_quant:
                    # fold the per-row V scale into the probs pre-matmul
                    pv = p * vsbuf[slot][:, :, None, :]
                else:
                    pv = p
                acc = acc * alpha + jax.lax.dot_general(
                    pv.reshape(B * NKV, G, block_t), v_blk,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).reshape(B, NKV, G, D)
                return m_new, s_l, acc

            m, s_l, acc = jax.lax.fori_loop(0, n_valid, body, (m0, l0, a0))

        # current token: score q . k_cur per kv head, fold into the softmax
        s_cur = jax.lax.dot_general(
            qg.reshape(B * NKV, G, D),
            k.astype(jnp.float32).reshape(B * NKV, D),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(B, NKV, G, 1)
        m_f = jnp.maximum(m, s_cur)
        alpha = jnp.exp(m - m_f)
        p_cur = jnp.exp(s_cur - m_f)
        s_l = s_l * alpha + p_cur
        acc = acc * alpha + p_cur * v.astype(jnp.float32)[:, :, None, :]
        attn = (acc / s_l).astype(jnp.bfloat16).reshape(B, NQ * D)

        h = h + mv(attn, o_w_ref, o_s_ref, j)
        if j + 1 < lps:
            # start the NEXT layer's first KV block now so its DMA hides
            # behind this layer's MLP matmuls (across grid steps the
            # top-of-kernel issue provides the same overlap)
            @pl.when(n_valid > 0)
            def _():
                for c in read(0, 0, l + 1):
                    c.start()

        xn = rms(h, pln_ref[j])
        gu = mv(xn, gu_w_ref, gu_s_ref, j).astype(jnp.float32)
        g, u = gu[:, :I], gu[:, I:]
        gated = (g * jax.nn.sigmoid(g) * u).astype(jnp.bfloat16)
        h = h + mv(gated, d_w_ref, d_s_ref, j)
        return h

    h = h_scr[...]
    for j in range(lps):
        h = run_layer(j, step * lps + j, h)
    h_scr[...] = h
    h_out_ref[...] = h

    if sample is not None:
        # --- final norm + codec head + sampler, fused into the last layer's
        # grid step (semantics: ops/sampling.py::sample_token_inner with
        # top_p == 1; the PRNG stream is the TPU core PRNG, like the CP
        # kernel's — documented divergence from jax.random.categorical).
        # Row-parallel over B: logits/penalty/top-k/Gumbel/argmax all act
        # per lane-row, so the batched serving path samples every sequence
        # inside the same grid step (XLA head+sampler glue was ~0.43 ms of
        # the 5.1 ms B=32 frame). ---
        L = shapes["L"]
        V = head_s_ref.shape[-1]
        temperature = sample["temperature"]
        top_k = sample["top_k"]
        rep_penalty = sample["rep_penalty"]
        eos_id = sample["eos_id"]  # -1: EOS does not bypass top-k

        @pl.when(step == L // lps - 1)
        def _():
            hn = rms(h, fnorm_ref[...])
            if mode == "dyn_int8":
                xf = hn.astype(jnp.float32)
                amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
                s_a = jnp.maximum(amax * (1.0 / 127.0), 1e-12)
                xq = jnp.round(xf / s_a).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    xq, head_w_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                logits = acc.astype(jnp.float32) * (s_a * head_s_ref[...])
            else:
                logits = jax.lax.dot_general(
                    hn, head_w_ref[...].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * head_s_ref[...]
            logits = logits + supp_ref[...]  # -1e30 on suppressed ids
            if rep_penalty != 1.0:
                pen = jnp.where(
                    logits < 0, logits * rep_penalty, logits * (1.0 / rep_penalty)
                )
                logits = jnp.where(seen_ref[...] > 0, pen, logits)

            lane_v = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
            if temperature <= 0:
                z = logits
            else:
                z = logits
                if eos_id >= 0:
                    eos_logit = jnp.sum(
                        jnp.where(lane_v == eos_id, z, 0.0), axis=-1, keepdims=True
                    )  # [B, 1]
                if 0 < top_k < V:
                    # seed the search from the SMALLEST UNSUPPRESSED logit:
                    # including the -1e30 masked entries would leave the
                    # interval so wide the threshold lands below every real
                    # logit (filter = no-op)
                    hi0 = jnp.max(z, axis=-1, keepdims=True)
                    lo0 = jnp.min(
                        jnp.where(z > -1e29, z, hi0), axis=-1, keepdims=True
                    )
                    if B == 1:
                        from .cp_kernel import topk_threshold_1row

                        lo = topk_threshold_1row(z, top_k, lo0)
                    else:
                        # per-row bisection (vectorizes over B; the parallel
                        # counting scheme above is single-row) — same
                        # precision claim at 24 halvings of the seed interval
                        def bs(_, lh):
                            lo, hi = lh
                            mid = 0.5 * (lo + hi)
                            cnt = jnp.sum(
                                (z >= mid).astype(jnp.float32),
                                axis=-1, keepdims=True,
                            )
                            ge = cnt >= top_k
                            return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

                        lo, _ = jax.lax.fori_loop(0, 24, bs, (lo0, hi0))
                    z = jnp.where(z >= lo, z, NEG_INF)
                if eos_id >= 0:
                    z = jnp.where(lane_v == eos_id, eos_logit, z)
                pltpu.prng_seed(pos_ref[B + 1], pos_ref[B + 2])
                bits = pltpu.prng_random_bits((B, V))
                b24 = pltpu.bitcast(bits, jnp.int32) & jnp.int32(0xFFFFFF)
                u_ = b24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
                z = z * (1.0 / temperature) + (-jnp.log(-jnp.log(u_)))
            m_z = jnp.max(z, axis=-1, keepdims=True)
            code = jnp.min(
                jnp.where(z == m_z, lane_v, V), axis=-1, keepdims=True
            )  # [B, 1]
            code_out_ref[...] = jnp.broadcast_to(code, (B, 128))
            h_out_ref[...] = hn  # post-norm hidden (CP consumes this)


def _pick_wide_sg(B: int) -> int:
    """Sequences per grouped-wide attention group (0 = narrow form).

    The wide form amortizes MXU weight-tile loads over SG*NQ query rows
    at SG*NKV x wasted FLOPs + an SG-inflated score matrix on the VPU.
    The tile-load cost model (tools/exp_attn_cost.py) predicted it would
    win at batch, but the hardware A/B says NARROW wins at every batch
    size — v5e, 0.6B int8, 128-slot cache, ms/frame for the whole step
    kernel (tools/microbench_batch.py, 2026-08-18):

        B=8:  narrow 1.703   wide SG=8 1.885
        B=16: narrow 2.181   wide SG=8 2.310
        B=32: narrow 3.144   SG=1 3.330, SG=2 3.183, SG=4 3.208,
                             SG=8 3.410

    The wasted-FLOP score plane + f32 K/V casts scale with SG*NKV*block_t
    and eat the tile-load savings at these shapes, so the default is
    narrow everywhere; the wide form stays as a parity-tested opt-in
    (``QWEN3TTS_TK_WIDE_SG=<sg>``; -1 forces narrow) for future shapes
    where the KV stream dominates.
    """
    import os

    env = os.environ.get("QWEN3TTS_TK_WIDE_SG")
    if env is not None:
        v = int(env)
        return 0 if v < 0 else (v if v and B % v == 0 else 0)
    return 0


def _pick_lps(L: int, B: int, s: dict, layout: str, block_t: int,
              wide_sg: int) -> int:
    """Layers per grid step. lps=2 halves the grid-step count and doubles
    the weight-DMA granularity (fewer pipeline boundaries on the
    HBM->VMEM weight stream, the measured bound at B=1); costs 2x the
    double-buffered weight VMEM, so it only engages when everything still
    fits. ``QWEN3TTS_TK_LPS`` overrides for A/B."""
    import os

    H, D, NQ, NKV, I = (s[k] for k in ("H", "D", "NQ", "NKV", "I"))
    itemsize = 1 if layout == "int8" else 2
    per_layer = (H * (NQ + 2 * NKV) * D + NQ * D * H + H * 3 * I) * itemsize
    kv_bufs = 4 * B * NKV * block_t * D * 2
    wide_planes = 0
    if wide_sg > 0:
        M, R = wide_sg * NQ, wide_sg * NKV * block_t
        wide_planes = (3 * M * R + 2 * R * D) * 4

    def fits(lps):
        return 2 * lps * per_layer + kv_bufs + wide_planes < 100 * 2**20

    env = os.environ.get("QWEN3TTS_TK_LPS")
    if env is not None:
        v = max(1, int(env))
        return v if L % v == 0 and fits(v) else 1
    # hardware A/B (v5e, 0.6B int8, B=1, 2026-08-18): lps=2 measured
    # 1.373 ms/frame vs 1.289 at lps=1 — the coarser weight-DMA blocking
    # LOSES ~6%; pipeline boundaries were not the weight-stream bound.
    # Default stays 1; the knob remains for future shapes.
    return 1


def _pick_block_t(T: int, B: int, NKV: int, D: int, wide_sg: int = 0) -> int:
    """KV stream block size (512/256/128 rows): ~T/8 so the stream tracks
    the valid prefix (a block larger than typical offsets reads rows that
    are never attended — measured +3% frame time at B=1 with 256-row
    blocks on a 256-slot cache), large for long caches where per-block DMA
    issue/wait latency dominates (a 4096-slot cache walks 8 blocks of 512
    instead of 32 of 128). Must divide T; the 4 double-buffered KV scratch
    buffers stay within ~34 MB of VMEM (at B=32 a 512-row block alone
    would need 134 MB). Grouped-wide attention additionally caps the
    per-group wide key-row count SG*NKV*block_t at 8192 — the [M, R] f32
    score/prob planes and the f32 K/V casts scale with R and would blow
    VMEM at e.g. B=8, block_t=512 (R=32768)."""
    budget = 34 * 2**20
    per_row = 4 * B * NKV * D * 2  # 2 slots x (K, V), bf16
    target = max(128, min(512, T // 8))
    if wide_sg > 0:
        target = min(target, max(128, 8192 // (wide_sg * NKV)))
    for cand in (512, 256):
        if cand <= target and T % cand == 0 and per_row * cand <= budget:
            return cand
    if per_row * 128 > budget and T % 64 == 0:
        return 64  # very large B (>=64): keep the KV scratch inside budget
    return 128


def _shapes(cfg) -> dict:
    return dict(
        H=cfg.hidden_size,
        D=cfg.head_dim,
        NQ=cfg.num_attention_heads,
        NKV=cfg.num_key_value_heads,
        I=max(cfg.layer_intermediate_size(i) for i in range(cfg.num_hidden_layers)),
        L=cfg.num_hidden_layers,
    )


def _layout(layers):
    """'int8' (Int8Linear), 'bf16' (dense fused arrays), or None."""
    import jax as _jax

    from .quant import Int8Linear

    keys = ("qkv_proj", "o_proj", "gate_up_proj", "down_proj")
    if not all(k in layers for k in keys):
        return None
    if all(isinstance(layers[k], Int8Linear) for k in keys):
        return "int8"
    if all(
        isinstance(layers[k], (_jax.Array, jnp.ndarray))
        and layers[k].dtype == jnp.bfloat16
        for k in keys
    ):
        return "bf16"
    return None


def _wq(w):
    """(weight stack [L, in, out], scale stack [L, 1, out] f32)."""
    from .quant import Int8Linear

    if isinstance(w, Int8Linear):
        return w.q, w.scale
    return w, jnp.ones((w.shape[0], 1, w.shape[-1]), jnp.float32)


def step_supported(params, cfg, batch: int = 1, kv_quant: bool = False) -> bool:
    """Fused projection layout (Int8Linear serving or dense bf16),
    128-aligned dims, double-buffered weights fit VMEM."""
    layers = params["layers"]
    layout = _layout(layers)
    if layout is None:
        return False
    s = _shapes(cfg)
    if not (s["H"] % 128 == 0 and s["I"] % 128 == 0 and s["D"] == 128):
        return False
    # Pallas double-buffers every blocked input: 2x the per-layer weights
    # must fit VMEM alongside the 4 KV stream buffers (v5e: 128 MB).
    H, D, NQ, NKV, I = (s[k] for k in ("H", "D", "NQ", "NKV", "I"))
    itemsize = 1 if layout == "int8" else 2
    per_layer = (
        H * (NQ + 2 * NKV) * D + NQ * D * H + H * 2 * I + I * H
    ) * itemsize
    if kv_quant and 4 * batch * NKV * 128 * D * 2 > 34 * 2**20:
        # int8-KV streams per-row SCALES whose last dim is the cache time
        # axis — Mosaic requires 128-aligned slices there, so the 64-row
        # block _pick_block_t falls back to at very large B is illegal
        # (measured: Mosaic "slice along dim 3 must be 128-aligned" at
        # B=64, 2026-08-21); without it the KV scratch blows the budget.
        # The lockstep decode uses the XLA path for this config.
        return False
    # KV scratch is bounded by _pick_block_t's 34 MB budget (floor: the
    # 128-row block that is always legal)
    kv_bufs = min(34 * 2**20, 4 * batch * NKV * 512 * D * 2)
    return 2 * per_layer + kv_bufs < 112 * 2**20


def talker_decode_step(
    params,
    cfg,
    x,  # [B, 1, H] bf16 input embeddings
    k_cache, v_cache,  # [L, B, Hkv, T, D] bf16 (b rows 0..pos[b]-1 valid)
    pos,  # scalar or [B] int32 per-sequence cache offsets
    cos, sin,  # [B, 1, D] per-sequence rope rows at each offset
    *,
    mode: str = "wo_bf16",
    interpret: bool = False,
    sample: dict | None = None,
    seed=None,  # [2] int32 (sampling only)
    suppress_add=None,  # [1, V] f32 additive mask, shared rows (sampling only)
    seen=None,  # [B, V] f32, 1.0 = seen (sampling only)
    k_scale=None,  # [L, B, Hkv, T] f32 — int8 cache row scales (KVCacheQ)
    v_scale=None,
):
    """One fused decode step (any static batch).

    Without ``sample``: returns (h [B, 1, H] pre-final-norm, k_new
    [L, B, Hkv, D], v_new [L, B, Hkv, D]).
    With ``sample`` (dict: temperature/top_k/rep_penalty/eos_id, any B):
    also runs final-norm + codec head + the code0 sampler in-kernel
    (row-parallel) and returns (h [B, 1, H] POST-norm, k_new, v_new,
    code0 [B] int32).
    """
    B = x.shape[0]
    s = _shapes(cfg)
    s["B"] = B
    L, H, D, NKV, NQ, I = s["L"], s["H"], s["D"], s["NKV"], s["NQ"], s["I"]
    T = k_cache.shape[3]
    # Attention streams ceil(max_off/block_t) valid-prefix blocks; block_t
    # adapts to (T, B) — see _pick_block_t. Small blocks track the valid
    # prefix tighter (at B=32 a fixed 512 block read the whole cache every
    # frame, ~1.9 GB/frame), big blocks amortize DMA latency on long
    # caches; the scratch budget arbitrates.
    wide_sg_early = _pick_wide_sg(B)
    block_t = _pick_block_t(T, B, NKV, D, wide_sg_early)
    assert T % block_t == 0, f"cache length {T} not a multiple of {block_t}"
    layers = params["layers"]
    offs_arr = jnp.broadcast_to(
        jnp.asarray(pos, jnp.int32).reshape(-1), (B,)
    )

    def nrm(w):  # [L, C] -> [L, 1, C] f32
        return w.astype(jnp.float32)[:, None, :]

    kv_quant = k_scale is not None
    assert kv_quant == (k_cache.dtype == jnp.int8)
    wide_sg = wide_sg_early
    lps = _pick_lps(L, B, s, _layout(layers) or "bf16", block_t, wide_sg)
    blk = lambda shape: pl.BlockSpec(
        (lps,) + shape[1:], lambda l, *_: (l,) + (0,) * (len(shape) - 1)
    )
    const = lambda shape: pl.BlockSpec(shape, lambda l, *_: (0,) * len(shape))
    kernel = functools.partial(
        _talker_step_kernel, s, mode, float(cfg.rms_norm_eps), block_t, sample,
        kv_quant, wide_sg, lps,
    )
    qkv_w, qkv_s = _wq(layers["qkv_proj"])
    o_w, o_s = _wq(layers["o_proj"])
    gu_w, gu_s = _wq(layers["gate_up_proj"])
    d_w, d_s = _wq(layers["down_proj"])

    in_specs = [
        blk((1, H, qkv_w.shape[-1])), blk((1, 1, qkv_w.shape[-1])),
        blk((1, NQ * D, H)), blk((1, 1, H)),
        blk((1, H, 2 * I)), blk((1, 1, 2 * I)),
        blk((1, I, H)), blk((1, 1, H)),
        blk((1, 1, H)), blk((1, 1, H)),
        blk((1, 1, D)), blk((1, 1, D)),
        const((B, D)), const((B, D)),
        const((B, H)),
        const((B, 128)),
    ]
    operands = [
        qkv_w, qkv_s,
        o_w, o_s,
        gu_w, gu_s,
        d_w, d_s,
        nrm(layers["input_layernorm"]),
        nrm(layers["post_attention_layernorm"]),
        nrm(layers["q_norm"]),
        nrm(layers["k_norm"]),
        cos[:, 0].astype(jnp.float32),
        sin[:, 0].astype(jnp.float32),
        x[:, 0].astype(jnp.bfloat16),
        jnp.broadcast_to(offs_arr[:, None], (B, 128)),
    ]
    if wide_sg > 0:
        # per-wide-query-row offsets: row r = offs[r // NQ] (built on host;
        # the [B, NQ] -> [B*NQ, 1] collapse is awkward inside Mosaic)
        in_specs.append(const((B * NQ, 128)))
        operands.append(
            jnp.broadcast_to(
                jnp.repeat(offs_arr, NQ)[:, None], (B * NQ, 128)
            )
        )
    out_specs = [
        const((B, H)),
        blk((1, B, NKV, D)),
        blk((1, B, NKV, D)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, H), jnp.bfloat16),
        jax.ShapeDtypeStruct((L, B, NKV, D), jnp.bfloat16),
        jax.ShapeDtypeStruct((L, B, NKV, D), jnp.bfloat16),
    ]
    scalars = [jnp.concatenate([offs_arr, jnp.max(offs_arr)[None]])]
    if sample is not None:
        from .quant import Int8Linear

        head = params["codec_head"]
        if isinstance(head, Int8Linear):
            head_w, head_s = head.q, head.scale
        else:
            head_w = head.astype(jnp.bfloat16)
            head_s = jnp.ones((1, head.shape[-1]), jnp.float32)
        V = head_w.shape[-1]
        in_specs += [
            const((H, V)), const((1, V)), const((1, H)),
            const((1, V)), const((B, V)),
        ]
        operands += [
            head_w, head_s.reshape(1, V).astype(jnp.float32),
            params["norm"].astype(jnp.float32)[None],
            suppress_add.astype(jnp.float32),
            jnp.broadcast_to(seen.astype(jnp.float32), (B, V)),
        ]
        out_specs.append(const((B, 128)))
        out_shape.append(jax.ShapeDtypeStruct((B, 128), jnp.int32))
        scalars = [jnp.concatenate([scalars[0], seed.astype(jnp.int32)])]

    kv_dtype = jnp.int8 if kv_quant else jnp.bfloat16
    scratch = [
        pltpu.VMEM((B, H), jnp.bfloat16),
        pltpu.VMEM((2, B, NKV, block_t, D), kv_dtype),
        pltpu.VMEM((2, B, NKV, block_t, D), kv_dtype),
    ]
    hbm_operands = [k_cache, v_cache]
    n_any = 2
    if kv_quant:
        scratch += [
            pltpu.VMEM((2, B, NKV, block_t), jnp.float32),
            pltpu.VMEM((2, B, NKV, block_t), jnp.float32),
        ]
        hbm_operands += [k_scale, v_scale]
        n_any = 4
    scratch.append(pltpu.SemaphoreType.DMA((2, 4 if kv_quant else 2)))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L // lps,),
            in_specs=in_specs + [pl.BlockSpec(memory_space=pl.ANY)] * n_any,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 2**20,
        ),
        interpret=interpret,
    )(*scalars, *operands, *hbm_operands)
    if sample is not None:
        h, k_new, v_new, code = out
        return h[:, None], k_new, v_new, code[:, 0]
    h, k_new, v_new = out
    return h[:, None], k_new, v_new
