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
from ..ops.sampling import build_suppress_mask, sample_token_inner
from . import code_predictor as cp
from . import talker as tk


class BatchCarry(NamedTuple):
    step: jnp.ndarray  # scalar int32: lockstep decode step counter
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


def _sample_batch(key, logits, sampling, seen, suppress_mask, eos_id):
    """Batched sampler: thin wrapper over the (batch-general) single-path
    sampler so the two paths can never diverge. logits [B,V] -> tokens [B]."""
    if sampling.forbid_eos:
        suppress_mask = suppress_mask.at[eos_id].set(True)
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
    hidden_last, logits_last, seen, key,
):
    """Sample codebook 0 for every sequence + batched code-predictor frame.

    Returns (code0 [B], rest [B, 15], is_eos [B], seen', key').
    """
    key, k_tok, k_cp = jax.random.split(key, 3)
    eos_id = talker_cfg.codec_eos_token_id
    code0 = _sample_batch(k_tok, logits_last, sampling, seen, suppress_mask, eos_id)
    B = code0.shape[0]
    seen = seen.at[jnp.arange(B), code0].set(True)
    is_eos = code0 == eos_id
    # the code predictor is batch-general; run it for all sequences (finished
    # ones produce discarded values — branching per-sequence would force a
    # gather/compact that costs more than the wasted compute at these sizes)
    rest = cp.predict_codes(
        cp_params, cp_cfg, talker_params, hidden_last,
        jnp.where(is_eos, 0, code0), k_cp,
        temperature=sampling.temperature, top_k=sampling.top_k, top_p=sampling.top_p,
        ref_exact_top_p=sampling.ref_exact_top_p,
    )
    return code0, rest, is_eos, seen, key


def _next_input_batch(
    cp_params, talker_params, trailing, trailing_lens, tts_pad, step, code0, rest
):
    """Per-sequence next input: trailing[b, step] (or pad) + codec-embed sum."""
    B = code0.shape[0]
    idx = jnp.minimum(step, trailing.shape[1] - 1)
    text = jnp.where(
        (step < trailing_lens)[:, None], trailing[:, idx], tts_pad[None]
    )  # [B, h]
    codec = cp.sum_codec_embeddings(cp_params, talker_params, code0, rest)
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

    code0, rest, is_eos, seen, key = _frame_batch(
        talker_params, cp_params, talker_cfg, cp_cfg, sampling, suppress_mask,
        last, logits_last, jnp.zeros((B, vocab), bool), key,
    )
    codes = jnp.zeros((B, max_frames, talker_cfg.num_code_groups), jnp.int32)
    tokens = jnp.zeros((B, max_frames), jnp.int32)
    row = jnp.concatenate([code0[:, None], rest], axis=1)  # [B, 16]
    codes = jnp.where(is_eos[:, None, None], codes, codes.at[:, 0].set(row))
    tokens = tokens.at[:, 0].set(jnp.where(is_eos, -1, code0))
    return BatchCarry(
        step=jnp.int32(1),
        frames=jnp.where(is_eos, 0, 1).astype(jnp.int32),
        done=is_eos,
        cur_input=_next_input_batch(
            cp_params, talker_params, trailing_embeds, trailing_lens,
            tts_pad_embed, jnp.int32(0), code0, rest,
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
) -> BatchCarry:
    suppress_mask = build_suppress_mask(
        talker_cfg.vocab_size, talker_cfg.codec_eos_token_id
    )
    max_frames = carry.codes.shape[1]
    limit = jnp.minimum(until_step, jnp.int32(max_frames))

    def cond(c: BatchCarry):
        active = ~c.done & (c.step < jnp.minimum(max_steps, limit))
        return jnp.any(active)

    def body(c: BatchCarry) -> BatchCarry:
        hidden, cache = tk.forward_batched_step(
            talker_params, talker_cfg, c.cur_input, c.cache, c.offsets
        )
        logits_last = tk.codec_logits(talker_params, hidden)[:, 0]
        code0, rest, is_eos, seen, key = _frame_batch(
            talker_params, cp_params, talker_cfg, cp_cfg, sampling, suppress_mask,
            hidden[:, 0], logits_last, c.seen, c.key,
        )
        # a sequence records this frame iff it was active and didn't hit EOS
        active = ~c.done & (c.step < max_steps)
        record = active & ~is_eos
        row = jnp.concatenate([code0[:, None], rest], axis=1)
        codes = jnp.where(
            record[:, None, None],
            jax.vmap(lambda cseq, r, s: cseq.at[s].set(r))(
                c.codes, row, jnp.broadcast_to(c.step, record.shape)
            ),
            c.codes,
        )
        # token stream sentinel matches the single path: -1 marks the EOS
        # step (consumers emit only t >= 0)
        token_val = jnp.where(is_eos, -1, code0)
        tokens = jnp.where(
            active[:, None],
            jax.vmap(lambda tseq, t, s: tseq.at[s].set(t))(
                c.tokens, token_val, jnp.broadcast_to(c.step, active.shape)
            ),
            c.tokens,
        )
        return BatchCarry(
            step=c.step + 1,
            frames=c.frames + record.astype(jnp.int32),
            done=c.done | (active & is_eos) | (c.step + 1 >= max_steps),
            cur_input=_next_input_batch(
                cp_params, talker_params, trailing_embeds, trailing_lens,
                tts_pad_embed, c.step, code0, rest,
            ),
            cache=cache,
            offsets=c.offsets + active.astype(jnp.int32),
            seen=jnp.where(record[:, None], seen, c.seen),
            codes=codes,
            tokens=tokens,
            key=key,
        )

    return jax.lax.while_loop(cond, body, carry)


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
) -> BatchResult:
    carry = prefill_start_batch(
        talker_params, cp_params, talker_cfg=talker_cfg, cp_cfg=cp_cfg,
        sampling=sampling, prefill_embeds=prefill_embeds, prefill_lens=prefill_lens,
        trailing_embeds=trailing_embeds, trailing_lens=trailing_lens,
        tts_pad_embed=tts_pad_embed, cache=cache, max_frames=max_frames, key=key,
    )
    carry = generate_chunk_batch(
        talker_params, cp_params, carry, talker_cfg=talker_cfg, cp_cfg=cp_cfg,
        sampling=sampling, trailing_embeds=trailing_embeds,
        trailing_lens=trailing_lens, tts_pad_embed=tts_pad_embed,
        max_steps=jnp.asarray(max_steps, jnp.int32),
        until_step=jnp.int32(max_frames),
    )
    return BatchResult(codes=carry.codes, n_frames=carry.frames, tokens=carry.tokens)
