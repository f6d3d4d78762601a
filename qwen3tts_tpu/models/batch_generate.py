"""Batched autoregressive generation: N utterances per chip, lockstep decode.

The reference is strictly batch-1 (SURVEY.md §2.4); this is the production
-serving extension. Single-token decode is weight-bandwidth-bound — the
same weight stream serves every sequence in the batch, so throughput
(codec tokens/s/chip) scales nearly linearly with batch size at almost
constant step latency.

Design: all sequences advance in lockstep through one fused while_loop.
Each sequence has its own prompt length, trailing-text stream, repetition
-penalty set, EOS state, and frame counter; finished sequences keep
"running" with frozen state (their samples are discarded) until every
sequence is done or the per-sequence step caps are reached — static shapes
throughout, no dynamic batch compaction.

Prefill note: prompts are right-padded to a shared bucket. Right-padding
changes absolute positions vs left-padding, but each sequence's positions
are computed from ITS OWN length, and pad slots beyond a sequence's length
are either overwritten by decode steps or masked — numerics match the
single-sequence path exactly (tested).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CodePredictorConfig, TalkerConfig
from ..ops.sampling import build_suppress_mask, sample_token_inner, sample_token_vec
from . import code_predictor as cp
from . import talker as tk


class BatchCarry(NamedTuple):
    step: jnp.ndarray  # scalar int32: lockstep iteration counter (chunk bound)
    steps: jnp.ndarray  # [B] int32: per-sequence decode steps taken
    frames: jnp.ndarray  # [B] int32: frames recorded per sequence
    done: jnp.ndarray  # [B] bool
    cur_input: jnp.ndarray  # [B, 1, h]
    cache: tk.KVCache  # [L, B, Hkv, T, D]
    offsets: jnp.ndarray  # [B] int32: per-sequence cache length
    seen: jnp.ndarray  # [B, vocab] bool
    codes: jnp.ndarray  # [B, max_frames, 16]
    tokens: jnp.ndarray  # [B, max_frames]
    key: jax.Array


class BatchResult(NamedTuple):
    codes: jnp.ndarray  # [B, max_frames, 16]
    n_frames: jnp.ndarray  # [B]
    tokens: jnp.ndarray  # [B, max_frames]


def _use_talker_sample_kernel_batch(
    talker_params, talker_cfg, sampling, B, kv_quant: bool = False
) -> bool:
    """Fused talker step + in-kernel row-parallel code0 sampler for the
    lockstep batch (same gates as the B=1 ``_use_talker_sample_kernel``
    plus kernel support at this batch size / KV-cache quantization)."""
    from ..ops.talker_kernel import step_supported
    from .generate import _use_talker_sample_kernel

    return _use_talker_sample_kernel(
        talker_params, talker_cfg, sampling
    ) and step_supported(talker_params, talker_cfg, batch=B, kv_quant=kv_quant)


def _sample_batch(key, logits, sampling, seen, suppress_mask, eos_id,
                  samp_vec=None):
    """Batched sampler: thin wrapper over the (batch-general) single-path
    sampler so the two paths can never diverge. logits [B,V] -> tokens [B].
    ``samp_vec`` ([B, 4]: temperature, top_k, top_p, repetition_penalty)
    switches to the per-row sampler (sampling.per_request mode)."""
    if sampling.forbid_eos:
        suppress_mask = suppress_mask.at[eos_id].set(True)
    if samp_vec is not None:
        return sample_token_vec(
            key,
            logits,
            temperature=samp_vec[:, 0],
            top_k=samp_vec[:, 1].astype(jnp.int32),
            top_p=samp_vec[:, 2],
            repetition_penalty=samp_vec[:, 3],
            seen=seen,
            suppress_mask=suppress_mask,
            eos_token_id=None if sampling.forbid_eos else eos_id,
            ref_exact_top_p=sampling.ref_exact_top_p,
        )
    return sample_token_inner(
        key,
        logits,
        temperature=sampling.temperature,
        top_k=sampling.top_k,
        top_p=sampling.top_p,
        ref_exact_top_p=sampling.ref_exact_top_p,
        repetition_penalty=sampling.repetition_penalty,
        seen=seen,
        suppress_mask=suppress_mask,
        eos_token_id=None if sampling.forbid_eos else eos_id,
    )


def _frame_batch(
    talker_params, cp_params, talker_cfg, cp_cfg, sampling, suppress_mask,
    hidden_last, logits_last, seen, key, code0=None, k_cp=None, samp_vec=None,
):
    """Sample codebook 0 for every sequence + batched code-predictor frame.

    Returns (code0 [B], rest [B, 15], is_eos [B], seen', key', codec_sum).
    ``codec_sum`` ([B, h] f32 or None) short-circuits the embedding gathers
    in ``_next_input_batch`` when the fused CP kernel produced it.
    When ``code0`` is given (sampled inside the fused talker kernel,
    tk.forward_batched_step_sample) the caller has already split ``key``
    and passes the CP subkey as ``k_cp``; ``logits_last`` may be None.
    """
    from .generate import _cpk_mode, _use_cp_kernel

    eos_id = talker_cfg.codec_eos_token_id
    if sampling.per_request and samp_vec is None:
        raise ValueError(
            "sampling.per_request requires a samp_vec [B, 4] argument "
            "(temperature, top_k, top_p, repetition_penalty per slot)"
        )
    if code0 is None:
        key, k_tok, k_cp = jax.random.split(key, 3)
        code0 = _sample_batch(
            k_tok, logits_last, sampling, seen, suppress_mask, eos_id,
            samp_vec=samp_vec if sampling.per_request else None,
        )
    B = code0.shape[0]
    seen = seen.at[jnp.arange(B), code0].set(True)
    is_eos = code0 == eos_id
    # the code predictor is batch-general; run it for all sequences (finished
    # ones produce discarded values — branching per-sequence would force a
    # gather/compact that costs more than the wasted compute at these sizes)
    code0_cp = jnp.where(is_eos, 0, code0)
    if _use_cp_kernel(cp_params, cp_cfg, talker_cfg, sampling, batch=B):
        from ..ops.cp_kernel import predict_codes_fused

        rest, esum = predict_codes_fused(
            cp_params, cp_cfg, talker_params, hidden_last, code0_cp, k_cp,
            temperature=sampling.temperature, top_k=sampling.top_k,
            mode=_cpk_mode(),
        )
        codec_sum = tk.embed_codec(talker_params, code0).astype(jnp.float32) + esum
        return code0, rest, is_eos, seen, key, codec_sum
    rest = cp.predict_codes(
        cp_params, cp_cfg, talker_params, hidden_last,
        code0_cp, k_cp,
        temperature=sampling.temperature, top_k=sampling.top_k, top_p=sampling.top_p,
        ref_exact_top_p=sampling.ref_exact_top_p,
        samp_vec=samp_vec if sampling.per_request else None,
    )
    return code0, rest, is_eos, seen, key, None


def _next_input_batch(
    cp_params, talker_params, trailing, trailing_lens, tts_pad, steps, code0, rest,
    codec_sum=None,
):
    """Per-sequence next input: trailing[b, steps[b]] (or pad) + codec-embed
    sum. ``steps`` is [B] — sequences admitted at different times (continuous
    batching) read their own trailing position. ``codec_sum`` short-circuits
    the embedding gathers when the fused CP kernel already summed them.

    The per-row trailing select is a one-hot matmul, not take_along_axis:
    an XLA gather along a non-minor axis of [B, T_trail, h] lowered to a
    serial row loop — measured 0.55 ms/frame at B=32 (~10% of the frame,
    tools/microbench_batch.py `next`, 2026-08-18); the [B, 1, T] x
    [B, T, h] batched matmul is one MXU op."""
    steps = jnp.broadcast_to(steps, code0.shape)
    idx = jnp.minimum(steps, trailing.shape[1] - 1)  # [B]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], trailing.shape[1]), 1)
        == idx[:, None]
    ).astype(trailing.dtype)  # [B, T_trail]
    text_rows = jax.lax.dot_general(
        onehot[:, None, :], trailing,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0].astype(trailing.dtype)  # [B, h]
    text = jnp.where((steps < trailing_lens)[:, None], text_rows, tts_pad[None])
    if codec_sum is None:
        codec = cp.sum_codec_embeddings(cp_params, talker_params, code0, rest)
    else:
        codec = codec_sum  # [B, h] float32
    return (text + codec.astype(text.dtype))[:, None]  # [B, 1, h]


@functools.partial(
    jax.jit,
    static_argnames=("talker_cfg", "cp_cfg", "sampling", "max_frames"),
)
def prefill_start_batch(
    talker_params,
    cp_params,
    *,
    talker_cfg: TalkerConfig,
    cp_cfg: CodePredictorConfig,
    sampling,
    prefill_embeds: jnp.ndarray,  # [B, P_bucket, h] right-padded per sequence
    prefill_lens: jnp.ndarray,  # [B]
    trailing_embeds: jnp.ndarray,  # [B, T_trail, h]
    trailing_lens: jnp.ndarray,  # [B]
    tts_pad_embed: jnp.ndarray,  # [h]
    cache: tk.KVCache,
    max_frames: int,
    key: jax.Array,
    samp_vec: jnp.ndarray | None = None,  # [B, 4] (sampling.per_request)
) -> BatchCarry:
    B = prefill_embeds.shape[0]
    vocab = talker_cfg.vocab_size
    suppress_mask = build_suppress_mask(vocab, talker_cfg.codec_eos_token_id)

    hidden, cache = tk.forward(
        talker_params, talker_cfg, prefill_embeds, cache, jnp.int32(0)
    )
    last = jnp.take_along_axis(
        hidden, (prefill_lens - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]  # [B, h]
    logits_last = tk.codec_logits(talker_params, last[:, None])[:, 0]

    code0, rest, is_eos, seen, key, codec_sum = _frame_batch(
        talker_params, cp_params, talker_cfg, cp_cfg, sampling, suppress_mask,
        last, logits_last, jnp.zeros((B, vocab), bool), key, samp_vec=samp_vec,
    )
    codes = jnp.zeros((B, max_frames, talker_cfg.num_code_groups), jnp.int32)
    tokens = jnp.zeros((B, max_frames), jnp.int32)
    row = jnp.concatenate([code0[:, None], rest], axis=1)  # [B, 16]
    codes = jnp.where(is_eos[:, None, None], codes, codes.at[:, 0].set(row))
    tokens = tokens.at[:, 0].set(jnp.where(is_eos, -1, code0))
    return BatchCarry(
        step=jnp.int32(1),
        steps=jnp.ones((B,), jnp.int32),
        frames=jnp.where(is_eos, 0, 1).astype(jnp.int32),
        done=is_eos,
        cur_input=_next_input_batch(
            cp_params, talker_params, trailing_embeds, trailing_lens,
            tts_pad_embed, jnp.zeros((B,), jnp.int32), code0, rest, codec_sum,
        ),
        cache=cache,
        offsets=prefill_lens.astype(jnp.int32),
        seen=seen,
        codes=codes,
        tokens=tokens,
        key=key,
    )


@functools.partial(
    jax.jit,
    static_argnames=("talker_cfg", "cp_cfg", "sampling"),
    donate_argnames=("carry",),
)
def generate_chunk_batch(
    talker_params,
    cp_params,
    carry: BatchCarry,
    *,
    talker_cfg: TalkerConfig,
    cp_cfg: CodePredictorConfig,
    sampling,
    trailing_embeds: jnp.ndarray,
    trailing_lens: jnp.ndarray,
    tts_pad_embed: jnp.ndarray,
    max_steps: jnp.ndarray,  # [B] per-sequence caps
    until_step: jnp.ndarray,  # scalar: lockstep bound for this chunk
    samp_vec: jnp.ndarray | None = None,  # [B, 4] (sampling.per_request)
) -> BatchCarry:
    suppress_mask = build_suppress_mask(
        talker_cfg.vocab_size, talker_cfg.codec_eos_token_id
    )
    # per-sequence progress is bounded by steps < max_steps <= max_frames;
    # until_step only bounds this chunk's lockstep iterations (it keeps
    # growing past max_frames under continuous batching)
    limit = until_step
    eos_id = talker_cfg.codec_eos_token_id
    B = trailing_embeds.shape[0]
    from .generate import _use_cp_kernel

    use_tks = (
        _use_talker_sample_kernel_batch(
            talker_params, talker_cfg, sampling, B,
            kv_quant=carry.cache.quantized,
        )
        and carry.cache.k.shape[3] % 128 == 0
    )
    # same cheap per-frame seed derivation as the B=1 fused loop
    # (models/generate.py): with both samplers in-kernel the only per-frame
    # key material is two int32 words per consumer
    cheap_seeds = use_tks and _use_cp_kernel(
        cp_params, cp_cfg, talker_cfg, sampling, batch=B
    )
    if use_tks:
        supp = suppress_mask
        if sampling.forbid_eos:
            supp = supp.at[eos_id].set(True)
        suppress_add = jnp.where(supp, jnp.float32(-1e30), jnp.float32(0.0))

    def cond(c: BatchCarry):
        active = ~c.done & (c.steps < max_steps)
        return jnp.any(active) & (c.step < limit)

    def body(c: BatchCarry) -> BatchCarry:
        if use_tks:
            from .generate import _seed_words

            if cheap_seeds:
                sw = _seed_words(c.key)
                st = c.step.astype(jnp.int32)
                seed_tok = jnp.stack(
                    [sw[0] + st * jnp.int32(-1640531527),  # 0x9E3779B9
                     sw[1] ^ (st * jnp.int32(-2048144789))]  # 0x85EBCA6B
                )
                k_cp = jnp.stack(
                    [sw[0] ^ (st * jnp.int32(-1028477387)),  # 0xC2B2AE3D
                     sw[1] + st * jnp.int32(668265263)]
                )
                key = c.key  # unsplit: kernels consume raw words only
            else:
                key, k_tok, k_cp = jax.random.split(c.key, 3)
                seed_tok = _seed_words(k_tok)
            hidden, cache, code0 = tk.forward_batched_step_sample(
                talker_params, talker_cfg, c.cur_input, c.cache, c.offsets,
                seen=c.seen, suppress_add=suppress_add, seed=seed_tok,
                temperature=sampling.temperature, top_k=sampling.top_k,
                repetition_penalty=sampling.repetition_penalty,
                eos_token_id=None if sampling.forbid_eos else eos_id,
            )
            code0, rest, is_eos, seen, key, codec_sum = _frame_batch(
                talker_params, cp_params, talker_cfg, cp_cfg, sampling,
                suppress_mask, hidden[:, 0], None, c.seen, key,
                code0=code0, k_cp=k_cp,
            )
        else:
            hidden, cache = tk.forward_batched_step(
                talker_params, talker_cfg, c.cur_input, c.cache, c.offsets
            )
            logits_last = tk.codec_logits(talker_params, hidden)[:, 0]
            code0, rest, is_eos, seen, key, codec_sum = _frame_batch(
                talker_params, cp_params, talker_cfg, cp_cfg, sampling,
                suppress_mask, hidden[:, 0], logits_last, c.seen, c.key,
                samp_vec=samp_vec,
            )
        # a sequence records this frame iff it was active and didn't hit EOS
        active = ~c.done & (c.steps < max_steps)
        record = active & ~is_eos
        row = jnp.concatenate([code0[:, None], rest], axis=1)
        codes = jnp.where(
            record[:, None, None],
            jax.vmap(lambda cseq, r, s: cseq.at[s].set(r))(c.codes, row, c.steps),
            c.codes,
        )
        # token stream sentinel matches the single path: -1 marks the EOS
        # step (consumers emit only t >= 0)
        token_val = jnp.where(is_eos, -1, code0)
        tokens = jnp.where(
            active[:, None],
            jax.vmap(lambda tseq, t, s: tseq.at[s].set(t))(c.tokens, token_val, c.steps),
            c.tokens,
        )
        steps = c.steps + active.astype(jnp.int32)
        return BatchCarry(
            step=c.step + 1,
            steps=steps,
            frames=c.frames + record.astype(jnp.int32),
            done=c.done | (active & is_eos) | (steps >= max_steps),
            cur_input=_next_input_batch(
                cp_params, talker_params, trailing_embeds, trailing_lens,
                tts_pad_embed, c.steps, code0, rest, codec_sum,
            ),
            cache=cache,
            offsets=c.offsets + active.astype(jnp.int32),
            seen=jnp.where(record[:, None], seen, c.seen),
            codes=codes,
            tokens=tokens,
            key=key,
        )

    return jax.lax.while_loop(cond, body, carry)


@functools.partial(
    jax.jit,
    static_argnames=("talker_cfg", "cp_cfg", "sampling"),
    donate_argnames=("carry", "trailing_all"),
)
def admit_slot(
    talker_params,
    cp_params,
    carry: BatchCarry,
    trailing_all: jnp.ndarray,  # [B, T_trail, h] per-slot trailing buffers
    *,
    talker_cfg: TalkerConfig,
    cp_cfg: CodePredictorConfig,
    sampling,
    slot: jnp.ndarray,  # scalar int32: slot to (re)fill
    prefill_embeds: jnp.ndarray,  # [1, P_bucket, h] right-padded
    prefill_len: jnp.ndarray,  # scalar int32
    trailing_row: jnp.ndarray,  # [T_trail, h] (padded to the shared bucket)
    trailing_len: jnp.ndarray,  # scalar int32
    tts_pad_embed: jnp.ndarray,  # [h]
    key: jax.Array,
    samp_row: jnp.ndarray | None = None,  # [1, 4] (sampling.per_request)
) -> tuple[BatchCarry, jnp.ndarray]:
    """Admit a new request into a finished slot between decode chunks.

    Continuous batching (extension beyond the batch-1 reference, SURVEY
    §2.4): prefills the new prompt single-sequence, scatters its KV rows
    into the batch cache at ``slot``, samples its first frame, and resets
    every per-slot state field. The other slots are untouched — they resume
    exactly where they left off on the next generate_chunk_batch call.
    """
    B = carry.codes.shape[0]
    vocab = talker_cfg.vocab_size
    L, _, Hkv, T_max, D = carry.cache.k.shape
    suppress_mask = build_suppress_mask(vocab, talker_cfg.codec_eos_token_id)

    # single-sequence prompt prefill into a scratch cache, then scatter the
    # prompt's KV rows (and row scales, for int8 caches) into the batch
    # cache at this slot — every cache leaf is [L, B, Hkv, T(, D)]
    scratch = jax.tree.map(
        lambda a: jnp.zeros((a.shape[0], 1) + a.shape[2:], a.dtype), carry.cache
    )
    hidden, scratch = tk.forward(
        talker_params, talker_cfg, prefill_embeds, scratch, jnp.int32(0)
    )
    new_cache = jax.tree.map(
        lambda full, scr: jax.lax.dynamic_update_slice(
            full, scr, (0, slot) + (0,) * (full.ndim - 2)
        ),
        carry.cache,
        scratch,
    )

    last = jax.lax.dynamic_index_in_dim(hidden, prefill_len - 1, 1, keepdims=False)
    logits = tk.codec_logits(talker_params, last[:, None])[:, 0]
    key, k_frame = jax.random.split(key)
    code0, rest, is_eos, seen1, _, codec_sum = _frame_batch(
        talker_params, cp_params, talker_cfg, cp_cfg, sampling, suppress_mask,
        last, logits, jnp.zeros((1, vocab), bool), k_frame, samp_vec=samp_row,
    )
    next_in = _next_input_batch(
        cp_params, talker_params, trailing_row[None], trailing_len[None],
        tts_pad_embed, jnp.zeros((1,), jnp.int32), code0, rest, codec_sum,
    )

    row = jnp.concatenate([code0[:, None], rest], axis=1)  # [1, 16]
    zero_codes = jnp.zeros((1,) + carry.codes.shape[1:], carry.codes.dtype)
    new_codes = jnp.where(is_eos[:, None, None], zero_codes, zero_codes.at[:, 0].set(row))
    new_tokens = jnp.zeros((1,) + carry.tokens.shape[1:], carry.tokens.dtype)
    new_tokens = new_tokens.at[:, 0].set(jnp.where(is_eos, -1, code0))

    def put(buf, val):
        return jax.lax.dynamic_update_slice(
            buf, val.astype(buf.dtype), (slot,) + (0,) * (buf.ndim - 1)
        )

    return (
        BatchCarry(
            step=carry.step,
            steps=put(carry.steps, jnp.ones((1,), jnp.int32)),
            frames=put(carry.frames, jnp.where(is_eos, 0, 1).astype(jnp.int32)[:1]),
            done=put(carry.done, is_eos[:1]),
            cur_input=put(carry.cur_input, next_in),
            cache=new_cache,
            offsets=put(carry.offsets, prefill_len[None]),
            seen=put(carry.seen, seen1),
            codes=put(carry.codes, new_codes),
            tokens=put(carry.tokens, new_tokens),
            key=key,
        ),
        jax.lax.dynamic_update_slice(
            trailing_all, trailing_row[None].astype(trailing_all.dtype),
            (slot, 0, 0),
        ),
    )


def generate_codes_batch(
    talker_params,
    cp_params,
    *,
    talker_cfg: TalkerConfig,
    cp_cfg: CodePredictorConfig,
    sampling,
    prefill_embeds,
    prefill_lens,
    trailing_embeds,
    trailing_lens,
    tts_pad_embed,
    cache,
    max_steps,  # [B]
    max_frames: int,
    key,
    samp_vec=None,
) -> BatchResult:
    carry = prefill_start_batch(
        talker_params, cp_params, talker_cfg=talker_cfg, cp_cfg=cp_cfg,
        sampling=sampling, prefill_embeds=prefill_embeds, prefill_lens=prefill_lens,
        trailing_embeds=trailing_embeds, trailing_lens=trailing_lens,
        tts_pad_embed=tts_pad_embed, cache=cache, max_frames=max_frames, key=key,
        samp_vec=samp_vec,
    )
    carry = generate_chunk_batch(
        talker_params, cp_params, carry, talker_cfg=talker_cfg, cp_cfg=cp_cfg,
        sampling=sampling, trailing_embeds=trailing_embeds,
        trailing_lens=trailing_lens, tts_pad_embed=tts_pad_embed,
        max_steps=jnp.asarray(max_steps, jnp.int32),
        until_step=jnp.int32(max_frames),
        samp_vec=samp_vec,
    )
    return BatchResult(codes=carry.codes, n_frames=carry.frames, tokens=carry.tokens)
