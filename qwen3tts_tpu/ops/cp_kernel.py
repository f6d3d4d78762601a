"""Fused code-predictor inner loop: ONE Pallas kernel per talker frame.

Motivation (measured on v5e, tools/microbench.py): the per-frame decode cost
splits as talker 1.50 ms / code predictor 2.97 ms — the CP dominates. The
reference runs the CP as 15 sequential single-token forwards per frame
(reference: Sources/Qwen3TTS/Models/Qwen3.swift:674-705); under XLA each
forward re-streams all 5 layers' weights from HBM (15 x ~74 MB int8 =
1.1 GB/frame) and pays dispatch overhead for ~750 small ops plus 15
samplings (~0.6 ms). This kernel keeps the ENTIRE int8 layer stack resident
in VMEM across the 16-position inner loop and runs matvecs, GQA attention
over the 16-slot cache, LM-head logits, top-k categorical sampling, and the
next-step embedding fetch as one device op. Weights are read from HBM once
per frame instead of 15 times.

What stays in HBM and is DMA'd per step (indices are loop counters — Mosaic
rejects data-dependent DMA indices, measured via tools/exp_cpk.py):
  * lm_head[j]           [H, V] int8   (~2 MB, triple-buffered)
  * codec_embedding[j]   [V, H] bf16   (~4 MB, triple-buffered); the sampled
    row is extracted with a one-hot matmul so the sampled code never leaves
    vector registers.

Matmul modes (static):
  * "dyn_int8": per-matvec dynamic activation quantization, s8 x s8 -> s32
    on the MXU (2x int8 MXU throughput on v5e, no dequant temporaries).
  * "wo_bf16":  weight-only — int8 weights converted to bf16 per use;
    numerically closest to the XLA Int8Linear path.

Sampling semantics match ops/sampling.py for the CP's parameter subset
(temperature / top-k; top_p==1.0 — the kernel is gated off otherwise):
top-k is found by 24-step binary search on the threshold (exact unless two
logits are within ~2^-24 of the k-th value) and the categorical draw uses
the Gumbel-max trick on the TPU core PRNG. The host-side RNG stream differs
from jax.random.categorical by construction; temperature<=0 (greedy argmax,
first-max tie-break) is bit-identical given equal logits.

The per-codebook heads/tables and the 2-token prefill mirror
cp.predict_codes exactly: positions 0..15, sampling heads 0..14 after
positions 1..15. As a byproduct the kernel also returns the sum of the 15
sampled codebook embeddings (the XLA path recomputes those gathers in
cp.sum_codec_embeddings for the next talker input — here they are already
in VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def topk_threshold_1row(z, top_k: int, lo0=None):
    """k-th-largest threshold for a single-row [1, V] logit tensor.

    Parallel multi-threshold counting: 3 rounds of 256 candidate
    thresholds, each round one [256, V] compare + row-reduce on the VPU.
    Interval shrinks 256x per round, so the returned threshold is within
    (max-min) * 2**-24 of the true k-th value — the same precision claim as
    the 24-step scalar bisection it replaces, at ~33 vector ops instead of
    ~144 sequential tiny ones (the bisection's fori_loop was the single
    largest op count in the CP sampling tail; see VERDICT r2 item 1).

    ``lo0`` optionally seeds the lower bound (e.g. smallest unsuppressed
    logit when -1e30 masks are present). Filtering ``z >= thr`` keeps at
    least ``top_k`` entries.
    """
    NT = 256
    hi = jnp.max(z, axis=-1, keepdims=True)  # [1, 1]
    lo = jnp.min(z, axis=-1, keepdims=True) if lo0 is None else lo0
    tidx = jax.lax.broadcasted_iota(jnp.int32, (NT, 1), 0).astype(jnp.float32)
    for _ in range(3):
        step = (hi - lo) * (1.0 / NT)
        thr = lo + (tidx + 1.0) * step  # [NT, 1]
        cnt = jnp.sum((z >= thr).astype(jnp.float32), axis=-1, keepdims=True)
        ok = cnt >= top_k  # monotone: True for small thr, False past k-th
        lo = jnp.max(jnp.where(ok, thr, lo), axis=0, keepdims=True)
        hi = lo + step
    return lo


def _cp_kernel(
    # static
    shapes: dict,
    mode: str,
    temperature: float,
    top_k: int,
    eps: float,
    fused: bool,  # layers carry qkv_proj/gate_up_proj instead of q/k/v, g/u
    want_logits: bool,  # False: logits_ref is a tiny dummy, writes skipped
    ablate: str | None,  # perf diagnosis only (tools/exp_cpk_ablate.py):
    #   "noattn" (skip attention), "nokvwrite" (skip cache writes),
    #   "nomlp" (skip gate_up/down), "nosample" (constant codes).
    #   Production always passes None; outputs are WRONG under ablation.
    # positional refs — layout depends on ``fused``; see unpacking below
    *refs,
):
    """Ref layout:
      scalar prefetch:
        seed_ref   SMEM [2] int32 PRNG seed words
      VMEM inputs:
        x0         [B, 2, H] bf16: [projected last_hidden, embed(code0)]
        cos, sin   [SLOTS, D] f32
        unfused: wq/sq [L,H,NQ*D], wk/sk wv/sv [L,H,NKV*D]
        fused:   wqkv/sqkv [L, H, (NQ+2NKV)*D]
        wo/so      [L, NQ*D, H]
        unfused: wg/sg wu/su [L,H,I];  fused: wgu/sgu [L, H, 2I]
        wd/sd      [L, I, H]
        iln, pln   [L, 1, H] f32;  qn, kn [L, 1, D];  fn [1, H]
        lms        [16, V] f32 lm_head scales (row j = head j; row 15 unused)
      HBM inputs:
        lmh_hbm    [NCB, H, V] int8;  emb_hbm [NCB, V, H] bf16
      outputs:
        codes      VMEM [B, 128] int32 (lanes 0..14 = codes)
        esum       VMEM [B, H] f32;  logits VMEM [16, B, V] f32
      scratch:
        kvf        VMEM [L, SLOTS, 2*B*NKV, D] bf16 — combined KV cache,
                   SLOT-MAJOR: within slot t, rows [0, B*NKV) = K at
                   b*NKV+h, rows [B*NKV, 2*B*NKV) = V. Slot-major makes
                   the per-position append ONE [1, 2*B*NKV, D] dynamic
                   store on the untiled SLOTS dim — the earlier row-major
                   layout ((b*NKV+h)*SLOTS+t) needed a masked rewrite of
                   the WHOLE buffer per layer-position (read+select+write
                   ≈ 6 MB at B=32 × 75 layer-positions ≈ 450 MB of VPU
                   traffic per frame; ~45× more than slot-major)
        hbuf       VMEM [3, H, V] int8;  ebuf VMEM [3, V, H] bf16
        hsem, esem DMA semaphores (3,) each
    """
    if fused:
        (seed_ref, x0_ref, cos_ref, sin_ref,
         wqkv_ref, sqkv_ref, wo_ref, so_ref, wgu_ref, sgu_ref, wd_ref, sd_ref,
         iln_ref, pln_ref, qn_ref, kn_ref, fn_ref, lms_ref,
         lmh_hbm, emb_hbm,
         codes_ref, esum_ref, logits_ref,
         kvf_ref, hbuf_ref, ebuf_ref, hsem, esem) = refs
    else:
        (seed_ref, x0_ref, cos_ref, sin_ref,
         wq_ref, sq_ref, wk_ref, sk_ref, wv_ref, sv_ref, wo_ref, so_ref,
         wg_ref, sg_ref, wu_ref, su_ref, wd_ref, sd_ref,
         iln_ref, pln_ref, qn_ref, kn_ref, fn_ref, lms_ref,
         lmh_hbm, emb_hbm,
         codes_ref, esum_ref, logits_ref,
         kvf_ref, hbuf_ref, ebuf_ref, hsem, esem) = refs
    H, D, NQ, NKV, I, V, L, NCB, SLOTS, B = (
        shapes[k]
        for k in ("H", "D", "NQ", "NKV", "I", "V", "L", "NCB", "SLOTS", "B")
    )
    BNKV = B * NKV  # K (or V) rows per slot in the slot-major cache
    scale = D**-0.5

    if temperature > 0:
        pltpu.prng_seed(seed_ref[0], seed_ref[1])

    def head_dma(j, slot):
        return pltpu.make_async_copy(lmh_hbm.at[j], hbuf_ref.at[slot], hsem.at[slot])

    def emb_dma(j, slot):
        return pltpu.make_async_copy(emb_hbm.at[j], ebuf_ref.at[slot], esem.at[slot])

    # prefetch: heads 0..2 (the loop prefetches p+1 two iterations ahead,
    # so heads 0-2 must already be in flight) and embedding table 0
    head_dma(0, 0).start()
    head_dma(1, 1).start()
    if NCB > 2:
        head_dma(2, 2).start()
    emb_dma(0, 0).start()

    # zero the KV cache: masked slots contribute 0-weighted rows to the
    # probs @ V dot, and 0 * garbage (NaN/Inf bit patterns) would poison it
    kvf_ref[...] = jnp.zeros_like(kvf_ref)
    if not want_logits:
        logits_ref[...] = jnp.zeros_like(logits_ref)  # tiny dummy output

    # ---- statics hoisted out of the 16-position loop (each was recomputed
    # per layer per position before; see VERDICT r2 "CP serial latency") ----
    # Attention runs over SEQUENCE GROUPS of SG <= 8: a flat all-batch score
    # matrix ([B*NQ, B*NKV*SLOTS]) costs O(B^2) in both MXU work and VPU
    # mask/exp traffic (at B=32: [512, 4096] f32 several times per layer per
    # position ~ 2.5 GB/frame — measured 1.96 ms/frame vs 0.90 at B=1,
    # tools/microbench_batch.py). Group-local blocks are [SG*NQ, SG*128]
    # (=[128, 1024] at SG=8): MXU-shaped, linear in B, and the masks are
    # shared by all groups.
    SG = B if B <= 8 else next(g for g in (8, 4, 2, 1) if B % g == 0)
    NGRP = B // SG
    GROWS = SG * NKV * SLOTS  # K (or V) cache rows per group
    qh_i = jax.lax.broadcasted_iota(jnp.int32, (SG * NQ, GROWS), 0)
    rr_i = jax.lax.broadcasted_iota(jnp.int32, (SG * NQ, GROWS), 1)
    group = NQ // NKV
    # slot-major score columns: col r = t*(SG*NKV) + s_local*NKV + h
    static_valid = (((rr_i % (SG * NKV)) // NKV) == (qh_i // NQ)) & (
        (rr_i % NKV) == ((qh_i % NQ) // group)
    )  # group-block-diagonal + GQA head-match (position-independent)
    slot_of = rr_i // (SG * NKV)  # cache slot of each score column
    nh_i = jax.lax.broadcasted_iota(jnp.int32, (1, NQ + NKV, D), 1)

    def rms(x, w_row):  # x [R, C] bf16, w_row [1, C] f32 -> bf16
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + eps) * w_row).astype(jnp.bfloat16)

    def mv(x, w_ref, l, s_ref):
        """x [1, K] bf16 @ int8 [K, N] * scale [1, N] -> [1, N] bf16."""
        if mode == "dyn_int8":
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # [1, 1]
            s = jnp.maximum(amax * (1.0 / 127.0), 1e-12)
            xq = jnp.round(xf / s).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, w_ref[l], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * (s * s_ref[l])
        else:
            w = w_ref[l].astype(jnp.bfloat16)
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            y = y * s_ref[l]
        return y.astype(jnp.bfloat16)

    def forward(x, p):
        """One position through all L layers. x [B, H] bf16, p scalar pos."""
        # dynamic f32 sublane slices (p is a loop counter, legal in Mosaic)
        cos_row = cos_ref[pl.ds(p, 1), :].astype(jnp.bfloat16)  # [1, D]
        sin_row = sin_ref[pl.ds(p, 1), :].astype(jnp.bfloat16)
        valid_p = static_valid & (slot_of <= p)  # shared by all L layers
        h = x
        for l in range(L):
            xn = rms(h, iln_ref[l])
            if fused:
                qkv = mv(xn, wqkv_ref, l, sqkv_ref)  # [B, (NQ+2NKV)*D]
                qk = qkv[:, : (NQ + NKV) * D].reshape(B, NQ + NKV, D)
                v = qkv[:, (NQ + NKV) * D :].reshape(B * NKV, D)
            else:
                qk = jnp.concatenate(
                    [
                        mv(xn, wq_ref, l, sq_ref).reshape(B, NQ, D),
                        mv(xn, wk_ref, l, sk_ref).reshape(B, NKV, D),
                    ],
                    axis=1,
                )
                v = mv(xn, wv_ref, l, sv_ref).reshape(B * NKV, D)
            # merged q/k RMSNorm + rope: ONE [B, NQ+NKV, D] pass with a
            # row-selected norm weight (rows < NQ: q_norm, rest: k_norm)
            wqk = jnp.where(nh_i < NQ, qn_ref[l], kn_ref[l])
            qk = rms(qk, wqk)
            half = D // 2
            rot = jnp.concatenate([-qk[..., half:], qk[..., :half]], axis=-1)
            qk = qk * cos_row + rot * sin_row
            q = qk[:, :NQ, :].reshape(B * NQ, D)
            k = qk[:, NQ:, :].reshape(B * NKV, D)

            # append k AND v at slot p: ONE [1, 2*B*NKV, D] dynamic store
            # on the untiled SLOTS dim (slot-major layout; Mosaic allows
            # dynamic indexing there, unlike bf16 dynamic-sublane stores)
            if ablate != "nokvwrite":
                kvf_ref[l, pl.ds(p, 1)] = jnp.concatenate([k, v], axis=0)[None]

            if ablate == "noattn":
                h = h + mv(q.reshape(B, NQ * D), wo_ref, l, so_ref)
                xn = rms(h, pln_ref[l])
                if ablate != "nomlp":
                    if fused:
                        gu = mv(xn, wgu_ref, l, sgu_ref).astype(jnp.float32)
                        gate, up = gu[:, :I], gu[:, I:]
                    else:
                        gate = mv(xn, wg_ref, l, sg_ref).astype(jnp.float32)
                        up = mv(xn, wu_ref, l, su_ref).astype(jnp.float32)
                    gated = (gate * jax.nn.sigmoid(gate) * up).astype(jnp.bfloat16)
                    h = h + mv(gated, wd_ref, l, sd_ref)
                continue
            # all-heads GQA over the 16-slot caches, one sequence-group at a
            # time (two MXU ops per group): score row b*NQ+qh, col (b', h, t)
            # valid iff b' == b and h == qh // (NQ/NKV) and t <= p (mask
            # hoisted: valid_p, shared by every group)
            attn_parts = []
            for gi in range(NGRP):
                qg = q[gi * SG * NQ : (gi + 1) * SG * NQ]
                # slot-major group reads: [SLOTS, SG*NKV, D] -> [GROWS, D]
                # (leading-dims merge, layout-preserving)
                kf = kvf_ref[
                    l, :, gi * SG * NKV : (gi + 1) * SG * NKV, :
                ].reshape(GROWS, D)
                vf = kvf_ref[
                    l, :, BNKV + gi * SG * NKV : BNKV + (gi + 1) * SG * NKV, :
                ].reshape(GROWS, D)
                s = jax.lax.dot_general(
                    qg, kf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale  # [SG*NQ, GROWS]
                s = jnp.where(valid_p, s, NEG_INF)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
                attn_parts.append(
                    jax.lax.dot_general(
                        probs, vf, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16)  # [SG*NQ, D]
                )
            attn = (
                attn_parts[0]
                if NGRP == 1
                else jnp.concatenate(attn_parts, axis=0)
            )

            h = h + mv(attn.reshape(B, NQ * D), wo_ref, l, so_ref)
            if ablate == "nomlp":
                continue
            xn = rms(h, pln_ref[l])
            if fused:
                gu = mv(xn, wgu_ref, l, sgu_ref).astype(jnp.float32)
                gate, up = gu[:, :I], gu[:, I:]
            else:
                gate = mv(xn, wg_ref, l, sg_ref).astype(jnp.float32)
                up = mv(xn, wu_ref, l, su_ref).astype(jnp.float32)
            gated = (gate * jax.nn.sigmoid(gate) * up).astype(jnp.bfloat16)
            h = h + mv(gated, wd_ref, l, sd_ref)
        return h

    lane_v = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)

    def sample(hp, h):
        """Head hp logits + sample. Returns code [1,1] i32 (writes logits)."""
        if ablate == "nosample":
            return jnp.full((B, 1), 1, jnp.int32) + h[:, :1].astype(jnp.int32) * 0
        hn = rms(h, fn_ref[...])
        hslot = jax.lax.rem(hp, 3)
        pltpu.make_async_copy(lmh_hbm.at[hp], hbuf_ref.at[hslot], hsem.at[hslot]).wait()
        if mode == "dyn_int8":
            xf = hn.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            s = jnp.maximum(amax * (1.0 / 127.0), 1e-12)
            xq = jnp.round(xf / s).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, hbuf_ref[hslot], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            logits = acc.astype(jnp.float32) * s
        else:
            logits = jax.lax.dot_general(
                hn, hbuf_ref[hslot].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        logits = logits * lms_ref[pl.ds(hp, 1), :]  # [B, V] f32
        if want_logits:
            logits_ref[pl.ds(hp, 1), :, :] = logits[None]

        if temperature <= 0:
            z = logits
        else:
            z = logits
            if 0 < top_k < V:
                if B == 1:
                    lo = topk_threshold_1row(z, top_k)
                else:
                    # per-row bisection (vectorizes over B; the parallel
                    # counting scheme above is single-row)
                    lo0 = jnp.min(z, axis=-1, keepdims=True)
                    hi0 = jnp.max(z, axis=-1, keepdims=True)

                    def bs(_, lh):
                        lo, hi = lh
                        mid = 0.5 * (lo + hi)
                        cnt = jnp.sum(
                            (z >= mid).astype(jnp.float32), axis=-1, keepdims=True
                        )
                        ge = cnt >= top_k
                        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

                    lo, _ = jax.lax.fori_loop(0, 24, bs, (lo0, hi0))
                z = jnp.where(z >= lo, z, NEG_INF)
            bits = pltpu.prng_random_bits((B, V))
            # Mosaic can't cast uint32 -> f32; mask to 24 positive int32 bits
            b24 = pltpu.bitcast(bits, jnp.int32) & jnp.int32(0xFFFFFF)
            u = b24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
            gumbel = -jnp.log(-jnp.log(u))
            z = z * (1.0 / temperature) + gumbel
        m = jnp.max(z, axis=-1, keepdims=True)
        return jnp.min(jnp.where(z == m, lane_v, V), axis=-1, keepdims=True)

    # ---- peeled positions 0 and 1 (the 2-token "prefill") ----
    forward(x0_ref[:, 0, :], 0)
    h = forward(x0_ref[:, 1, :], 1)
    c = sample(0, h)  # codebook-1 codes [B, 1]
    codes = jnp.where(
        lane_v[:, :128] == 0, c, jnp.zeros((B, 128), jnp.int32)
    )
    esum = jnp.zeros((B, H), jnp.float32)

    # ---- positions 2..SLOTS-1 ----
    def step(p, carry):
        prev_c, codes, esum = carry
        j = p - 2  # embedding table feeding this position
        # prefetch next embedding table / lm_head (loop-counter indices only)
        @pl.when(j + 1 <= NCB - 1)
        def _():
            emb_dma(j + 1, jax.lax.rem(j + 1, 3)).start()

        @pl.when(p + 1 <= NCB - 1)
        def _():
            head_dma(p + 1, jax.lax.rem(p + 1, 3)).start()

        eslot = jax.lax.rem(j, 3)
        emb_dma(j, eslot).wait()
        onehot = (lane_v == prev_c).astype(jnp.bfloat16)  # [1, V]
        row = jax.lax.dot_general(
            onehot, ebuf_ref[eslot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, H]
        esum = esum + row
        h = forward(row.astype(jnp.bfloat16), p)
        c = sample(p - 1, h)
        codes = jnp.where(lane_v[:, :128] == (p - 1), c, codes)
        return c, codes, esum

    c, codes, esum = jax.lax.fori_loop(2, SLOTS, step, (c, codes, esum))

    # last code's embedding row (table NCB-1, prefetched by the p==SLOTS-1
    # iteration) — needed only for the embedding sum
    eslot = jax.lax.rem(NCB - 1, 3)
    emb_dma(NCB - 1, eslot).wait()
    onehot = (lane_v == c).astype(jnp.bfloat16)
    row = jax.lax.dot_general(
        onehot, ebuf_ref[eslot], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    esum_ref[...] = esum + row
    codes_ref[...] = codes


def _shapes(cp_cfg, talker_h: int, batch: int = 1) -> dict:
    return dict(
        H=cp_cfg.hidden_size,
        D=cp_cfg.head_dim,
        NQ=cp_cfg.num_attention_heads,
        NKV=cp_cfg.num_key_value_heads,
        I=cp_cfg.intermediate_size,
        V=cp_cfg.vocab_size,
        L=cp_cfg.num_hidden_layers,
        NCB=cp_cfg.num_code_groups - 1,
        SLOTS=cp_cfg.num_code_groups,
        B=batch,
    )


def kernel_supported(cp_params, cp_cfg, talker_h: int, batch: int = 1) -> bool:
    """True if this CP parameterization fits the fused kernel.

    Requires: Int8Linear layer weights (the serving config), no
    small-to-MTP projection (talker_h == cp hidden), dense (unquantized)
    embedding tables, 128-aligned dims, and a VMEM-resident footprint that
    fits v5e (~128 MB, we budget 100 for the batch-independent parts and
    add the per-sequence buffers on top — B=64 at the 0.6B shapes blew
    the 126 MB scoped-vmem stack by 914 KB (exp_scale_curve, 2026-08-21),
    so the gate is batch-aware and the lockstep decode falls back to the
    XLA CP path past the fit limit instead of failing to compile).
    """
    from .quant import Int8Linear

    if "small_to_mtp_projection" in cp_params:
        return False
    layers = cp_params["layers"]
    if "qkv_proj" in layers:  # fused serving layout
        need = ("qkv_proj", "o_proj", "gate_up_proj", "down_proj")
    else:
        need = (
            "q_proj", "k_proj", "v_proj", "o_proj",
            "gate_proj", "up_proj", "down_proj",
        )
    if any(k not in layers or not isinstance(layers[k], Int8Linear) for k in need):
        return False
    if not isinstance(cp_params["lm_head"], Int8Linear):
        return False
    if isinstance(cp_params["codec_embedding"], Int8Linear):
        return False
    s = _shapes(cp_cfg, talker_h)
    if s["H"] % 128 or s["I"] % 128 or s["V"] % 128 or s["D"] != 128:
        return False
    if s["NKV"] * s["SLOTS"] != 128:
        return False
    weight_bytes = s["L"] * (
        s["H"] * (s["NQ"] + 2 * s["NKV"]) * s["D"] + s["NQ"] * s["D"] * s["H"]
        + 3 * s["H"] * s["I"]
    )
    buf_bytes = 3 * s["H"] * s["V"] + 3 * s["V"] * s["H"] * 2
    if weight_bytes + buf_bytes >= 100 * 2**20:
        return False
    # per-sequence VMEM: KV scratch [L, SLOTS, 2*B*NKV, D] bf16 + x0 rows
    # + ~0.2 MB/seq of compute temporaries. Calibrated against the
    # measured B=64 failure (126.89 MB scoped alloc = 93.7 MB fixed from
    # the terms above + ~0.52 MB/seq at the 0.6B shapes); the 123 MB
    # budget keeps ~4 MB margin under the observed ~126 MB stack limit
    # while passing the measured-good B=48 (118.6 MB estimated).
    per_seq = (
        s["L"] * s["SLOTS"] * 2 * s["NKV"] * s["D"] * 2
        + 4 * s["H"]
        + 200 * 1024
    )
    return weight_bytes + buf_bytes + batch * per_seq < 123 * 2**20


@functools.partial(
    jax.jit,
    static_argnames=(
        "cp_cfg", "talker_h", "temperature", "top_k", "mode", "interpret",
        "want_logits", "ablate",
    ),
)
def _call(
    cp_params,
    x0,
    seed,
    *,
    cp_cfg,
    talker_h: int,
    temperature: float,
    top_k: int,
    mode: str,
    interpret: bool,
    want_logits: bool = False,
    ablate: str | None = None,
):
    B = x0.shape[0]
    s = _shapes(cp_cfg, talker_h, batch=B)
    L, H, D, V, NCB, SLOTS = s["L"], s["H"], s["D"], s["V"], s["NCB"], s["SLOTS"]
    layers = cp_params["layers"]

    from ..ops.rope import rope_cos_sin

    cos, sin = rope_cos_sin(
        jnp.arange(SLOTS, dtype=jnp.int32)[None], D, cp_cfg.rope_theta, jnp.float32
    )
    cos, sin = cos[0], sin[0]  # [SLOTS, D]

    def nrm(w):  # [L, C] -> [L, 1, C] f32
        return w.astype(jnp.float32)[:, None, :]

    lm = cp_params["lm_head"]
    lms = jnp.zeros((NCB + 1, V), jnp.float32).at[:NCB].set(lm.scale[:, 0, :])

    fused = "qkv_proj" in layers
    kernel = functools.partial(
        _cp_kernel, s, mode, float(temperature), int(top_k),
        float(cp_cfg.rms_norm_eps), fused, want_logits, ablate,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pltpu.ANY)
    n_vmem_in = 17 if fused else 23
    codes, esum, logits = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[vmem] * n_vmem_in + [any_, any_],
            out_specs=[vmem, vmem, vmem],
            scratch_shapes=[
                pltpu.VMEM((L, SLOTS, 2 * B * s["NKV"], D), jnp.bfloat16),
                pltpu.VMEM((3, H, V), jnp.int8),
                pltpu.VMEM((3, V, H), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            # diagnostics-only: 16*B*V f32 of VMEM (4.2 MB at B=32 — the
            # difference between fitting and a scoped-vmem OOM); a tiny
            # dummy when the caller doesn't ask for logits
            jax.ShapeDtypeStruct(
                (NCB + 1, B, V) if want_logits else (1, 8, 128), jnp.float32
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 2**20,
        ),
        interpret=interpret,
    )(
        seed,
        x0,
        cos,
        sin,
        *(
            (
                layers["qkv_proj"].q, layers["qkv_proj"].scale,
                layers["o_proj"].q, layers["o_proj"].scale,
                layers["gate_up_proj"].q, layers["gate_up_proj"].scale,
                layers["down_proj"].q, layers["down_proj"].scale,
            )
            if fused
            else (
                layers["q_proj"].q, layers["q_proj"].scale,
                layers["k_proj"].q, layers["k_proj"].scale,
                layers["v_proj"].q, layers["v_proj"].scale,
                layers["o_proj"].q, layers["o_proj"].scale,
                layers["gate_proj"].q, layers["gate_proj"].scale,
                layers["up_proj"].q, layers["up_proj"].scale,
                layers["down_proj"].q, layers["down_proj"].scale,
            )
        ),
        nrm(layers["input_layernorm"]),
        nrm(layers["post_attention_layernorm"]),
        nrm(layers["q_norm"]),
        nrm(layers["k_norm"]),
        cp_params["norm"].astype(jnp.float32)[None],
        lms,
        lm.q,
        cp_params["codec_embedding"].astype(jnp.bfloat16),
    )
    return codes, esum, logits


def predict_codes_fused(
    cp_params,
    cp_cfg,
    talker_params,
    last_hidden,  # [B, talker_h]
    code0,  # [B] int32
    key,
    *,
    temperature: float,
    top_k: int,
    mode: str = "dyn_int8",
    interpret: bool = False,
    return_logits: bool = False,
    ablate: str | None = None,  # perf-diagnosis only; outputs WRONG if set
):
    """Drop-in fused replacement for cp.predict_codes (top_p==1, any B).

    All B sequences run the 16-position inner loop in ONE kernel call:
    matvecs batch to [B, H] and the flat-cache attention uses a
    block-diagonal batch mask, so the VMEM-resident weights are read once
    per frame for the whole batch.

    Returns (codes [B, NCB] int32, emb_sum [B, H] f32) — emb_sum is the sum
    of the 15 sampled per-codebook embedding rows (cp.sum_codec_embeddings
    minus the talker codec embedding of code0, which the caller adds).
    With ``return_logits``, adds logits [NCB, V] for B == 1 else [NCB, B, V].
    """
    from ..models.code_predictor import _embed

    talker_h = last_hidden.shape[-1]
    B = last_hidden.shape[0]
    s = _shapes(cp_cfg, talker_h, batch=B)
    code0_embed = _embed(talker_params["codec_embedding"], code0).astype(jnp.bfloat16)
    x0 = jnp.stack(
        [last_hidden.astype(jnp.bfloat16), code0_embed], axis=1
    )  # [B, 2, H]
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(key).reshape(-1)
    else:
        kd = key.reshape(-1)  # raw uint32 [2] PRNGKey
    seed = jnp.stack([kd[0], kd[-1]]).astype(jnp.int32)
    codes, esum, logits = _call(
        cp_params,
        x0,
        seed,
        cp_cfg=cp_cfg,
        talker_h=talker_h,
        temperature=float(temperature),
        top_k=int(top_k),
        mode=mode,
        interpret=interpret,
        want_logits=bool(return_logits),
        ablate=ablate,
    )
    out = codes[:, : s["NCB"]]
    if return_logits:
        lg = logits[: s["NCB"]]
        return out, esum, lg[:, 0] if B == 1 else lg
    return out, esum
