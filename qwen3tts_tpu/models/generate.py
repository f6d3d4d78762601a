"""Fused autoregressive generation loop.

This replaces the reference's three copied Swift decode loops
(reference: Sources/Qwen3TTS/Models/Qwen3.swift:587-755, 783-962, 1009-1203)
with ONE jit-compiled program: prefill + ``lax.while_loop`` over decode steps,
where each step runs the talker, samples codebook 0, conditionally runs the
15-step code-predictor inner loop, and assembles the next input embedding —
entirely on device. The reference pays a host⇄GPU sync per talker step *and*
per codebook (16 syncs per 80 ms audio frame, SURVEY.md §3.2); here the host
is only involved between *chunks*.

Structure:
  * ``prefill_start``  — process the (bucketed, right-padded) prompt, sample
    the first frame, return a resumable :class:`GenCarry`.
  * ``generate_chunk`` — advance the carry up to N more frames in one fused
    while_loop (token events are read from the returned buffer, so streaming
    needs no host callbacks — important: the TPU tunnel in this environment
    does not support ``io_callback``).
  * ``generate_codes`` — non-streaming convenience: prefill + full loop as a
    single program (fastest path; one device round-trip per utterance).

Static shapes throughout: prompts right-padded to buckets, generated codes in
a preallocated ``[max_frames, 16]`` buffer, the trailing text stream as a
padded buffer indexed by the step counter; EOS terminates the while_loop
without shape changes.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import CodePredictorConfig, TalkerConfig
from ..ops.sampling import build_suppress_mask, sample_token_inner
from . import code_predictor as cp
from . import talker as tk


class SamplingConfig(NamedTuple):
    """Static sampling hyper-parameters (hashable; part of the jit key).

    ``forbid_eos`` suppresses the EOS token entirely (benchmarking: forces
    generation to run to the step cap regardless of weights).
    ``ref_exact_top_p`` reproduces the reference's unnormalized-exp top-p
    (Qwen3.swift:92-117) for bit-parity runs.
    ``per_request`` (serving): sampling parameters are per-slot DATA — the
    batched paths take a ``samp_vec`` [B, 4] array (temperature, top_k,
    top_p, repetition_penalty per row) and sample each slot with its own
    values (ops/sampling.py::sample_token_vec); the scalar fields become
    the defaults for requests that don't override. The in-kernel samplers
    (which bake scalars into the compiled program) are disabled in this
    mode — the reference grants per-call sampling on every generate
    (Qwen3.swift:587-616), and serving must not silently drop it."""

    temperature: float = 0.9
    top_k: int = 50
    top_p: float = 1.0
    repetition_penalty: float = 1.05
    forbid_eos: bool = False
    ref_exact_top_p: bool = False
    per_request: bool = False


class GenCarry(NamedTuple):
    """Resumable generation state (a pytree; flows through jit unchanged)."""

    step: jnp.ndarray  # frames completed
    eos: jnp.ndarray  # bool: EOS sampled
    cur_input: jnp.ndarray  # [B, 1, h] next talker input
    cache: tk.KVCache
    offset: jnp.ndarray  # valid cache length
    seen: jnp.ndarray  # [vocab] bool, repetition-penalty set
    codes: jnp.ndarray  # [max_frames, 16] int32
    tokens: jnp.ndarray  # [max_frames] int32 first-codebook tokens
    key: jax.Array


class GenResult(NamedTuple):
    codes: jnp.ndarray  # [max_frames, 16] int32 (rows >= n_frames are zero)
    n_frames: jnp.ndarray  # scalar int32: frames generated before EOS/cap
    tokens: jnp.ndarray  # [max_frames] int32


def _use_cp_kernel(
    cp_params, cp_cfg, talker_cfg, sampling: SamplingConfig, batch: int = 1
) -> bool:
    """Trace-time gate for the fused Pallas CP inner-loop kernel.

    Engaged for the int8 serving config on TPU when the sampling subset the
    kernel implements applies (top_p disabled, standard top-p semantics).
    QWEN3TTS_NO_CP_KERNEL=1 forces the XLA path.
    """
    import os

    if os.environ.get("QWEN3TTS_NO_CP_KERNEL"):
        return False
    if sampling.top_p < 1.0 or sampling.ref_exact_top_p or sampling.per_request:
        return False
    if jax.devices()[0].platform not in ("tpu", "axon"):
        return False
    from ..ops.cp_kernel import kernel_supported

    return kernel_supported(cp_params, cp_cfg, talker_cfg.hidden_size, batch)


def _cpk_mode() -> str:
    import os

    return os.environ.get("QWEN3TTS_CPK_MODE", "wo_bf16")


def _use_talker_sample_kernel(talker_params, talker_cfg, sampling) -> bool:
    """Trace-time gate for the whole-step talker kernel WITH fused codec-head
    sampling (ops/talker_kernel.py, sample mode). Same sampling subset as the
    CP kernel (top_p disabled, standard semantics)."""
    import os

    if os.environ.get("QWEN3TTS_NO_TALKER_KERNEL"):
        return False
    if os.environ.get("QWEN3TTS_NO_SAMPLE_KERNEL"):
        # keep the fused step kernel but sample through the XLA head+sampler
        # (A/B knob: the in-kernel tail wins at B=1, costs at large B)
        return False
    if sampling.top_p < 1.0 or sampling.ref_exact_top_p or sampling.per_request:
        return False
    if jax.devices()[0].platform not in ("tpu", "axon"):
        return False
    from ..ops.quant import Int8Linear, PackedLinear
    from ..ops.talker_kernel import step_supported

    head = talker_params.get("codec_head")
    if head is None or isinstance(head, PackedLinear):
        return False  # Int8Linear or a dense array both fuse in-kernel
    return step_supported(talker_params, talker_cfg)


def _seed_words(key) -> jnp.ndarray:
    """[2] int32 seed words for the TPU core PRNG from a JAX PRNG key."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(key).reshape(-1)
    else:
        kd = key.reshape(-1)
    return jnp.stack([kd[0], kd[-1]]).astype(jnp.int32)


def _frame(
    talker_params,
    cp_params,
    talker_cfg: TalkerConfig,
    cp_cfg: CodePredictorConfig,
    sampling: SamplingConfig,
    suppress_mask,
    hidden_last,  # [B, h] talker hidden at the sampled position
    logits_last,  # [B, vocab] float32 (None when ``code0`` is precomputed)
    seen,  # [vocab] bool
    key,
    code0=None,  # [B] int32: already sampled in-kernel (fused talker step)
    k_cp=None,  # CP sampling key, required with ``code0``
):
    """Sample codebook 0 + run the code predictor for one frame.

    Returns (code0 [B], rest [B,15], is_eos scalar bool, seen', key',
    codec_sum). ``codec_sum`` is the summed 16-codebook embedding for the
    next talker input ([B, h] float32) when the fused CP kernel produced it
    as a byproduct, else None (the caller gathers it the XLA way).
    B must be 1: ``seen``/``is_eos`` bookkeeping reads index 0 only (the
    batched path lives in batch_generate.py with per-sequence state).
    When ``code0`` is given (sampled inside the fused talker kernel), the
    caller has already split ``key`` and passes the CP subkey as ``k_cp``.
    """
    assert hidden_last.shape[0] == 1, (
        f"_frame is single-sequence (B=1), got B={hidden_last.shape[0]}; "
        "use models/batch_generate.py for batched decoding"
    )
    eos_id = talker_cfg.codec_eos_token_id
    if code0 is None:
        key, k_tok, k_cp = jax.random.split(key, 3)
        if sampling.forbid_eos:
            suppress_mask = suppress_mask.at[eos_id].set(True)
        code0 = sample_token_inner(
            k_tok,
            logits_last,
            temperature=sampling.temperature,
            top_k=sampling.top_k,
            top_p=sampling.top_p,
            repetition_penalty=sampling.repetition_penalty,
            seen=seen,
            suppress_mask=suppress_mask,
            eos_token_id=None if sampling.forbid_eos else eos_id,
            ref_exact_top_p=sampling.ref_exact_top_p,
        )  # [B]
    seen = seen.at[code0[0]].set(True)
    is_eos = code0[0] == eos_id

    use_cpk = _use_cp_kernel(cp_params, cp_cfg, talker_cfg, sampling)
    if use_cpk:
        from ..ops.cp_kernel import predict_codes_fused

        def run_cp():
            rest, esum = predict_codes_fused(
                cp_params,
                cp_cfg,
                talker_params,
                hidden_last,
                code0,
                k_cp,
                temperature=sampling.temperature,
                top_k=sampling.top_k,
                mode=_cpk_mode(),
            )
            csum = (
                tk.embed_codec(talker_params, code0).astype(jnp.float32) + esum
            )
            return rest, csum

        rest, codec_sum = jax.lax.cond(
            is_eos,
            lambda: (
                jnp.zeros((code0.shape[0], cp_cfg.num_code_groups - 1), jnp.int32),
                jnp.zeros((code0.shape[0], talker_cfg.hidden_size), jnp.float32),
            ),
            run_cp,
        )
        return code0, rest, is_eos, seen, key, codec_sum

    rest = jax.lax.cond(
        is_eos,
        lambda: jnp.zeros((code0.shape[0], cp_cfg.num_code_groups - 1), jnp.int32),
        lambda: cp.predict_codes(
            cp_params,
            cp_cfg,
            talker_params,
            hidden_last,
            code0,
            k_cp,
            temperature=sampling.temperature,
            top_k=sampling.top_k,
            top_p=sampling.top_p,
            ref_exact_top_p=sampling.ref_exact_top_p,
        ),
    )
    return code0, rest, is_eos, seen, key, None


def _next_input(
    cp_params, talker_params, trailing_embeds, trailing_len, tts_pad_embed, step,
    code0, rest, codec_sum=None,
):
    """trailing text (or pad) + sum of all 16 codebook embeddings
    (reference Qwen3.swift:710-728). ``codec_sum`` short-circuits the
    embedding gathers when the fused CP kernel already summed them."""
    text = jnp.where(
        step < trailing_len,
        trailing_embeds[jnp.minimum(step, trailing_embeds.shape[0] - 1)],
        tts_pad_embed,
    )
    if codec_sum is None:
        codec = cp.sum_codec_embeddings(cp_params, talker_params, code0, rest)
    else:
        codec = codec_sum  # [B, h] float32
    return (text[None] + codec.astype(text.dtype))[:, None]  # [B, 1, h]


def _record(carry_codes, carry_tokens, step, code0, rest, is_eos):
    row = jnp.concatenate([code0[:1], rest[0]], axis=0)
    codes = jnp.where(is_eos, carry_codes, carry_codes.at[step].set(row))
    tokens = carry_tokens.at[step].set(jnp.where(is_eos, -1, code0[0]))
    return codes, tokens


@functools.partial(
    jax.jit,
    static_argnames=("talker_cfg", "cp_cfg", "sampling", "max_frames"),
)
def prefill_start(
    talker_params,
    cp_params,
    *,
    talker_cfg: TalkerConfig,
    cp_cfg: CodePredictorConfig,
    sampling: SamplingConfig,
    prefill_embeds: jnp.ndarray,  # [1, P_bucket, h] right-padded
    prefill_len: jnp.ndarray,  # scalar int32: real prompt tokens
    trailing_embeds: jnp.ndarray,  # [T_trail, h]
    trailing_len: jnp.ndarray,
    tts_pad_embed: jnp.ndarray,  # [h]
    cache: tk.KVCache,
    max_frames: int,
    key: jax.Array,
) -> GenCarry:
    """Process the prompt and sample the first frame; returns a GenCarry."""
    vocab = talker_cfg.vocab_size
    suppress_mask = build_suppress_mask(vocab, talker_cfg.codec_eos_token_id)
    codes_buf = jnp.zeros((max_frames, talker_cfg.num_code_groups), jnp.int32)
    tokens_buf = jnp.zeros((max_frames,), jnp.int32)
    seen0 = jnp.zeros((vocab,), bool)

    hidden, cache = tk.forward(
        talker_params, talker_cfg, prefill_embeds, cache, jnp.int32(0)
    )
    hidden_last = jax.lax.dynamic_index_in_dim(
        hidden, prefill_len - 1, axis=1, keepdims=False
    )
    logits_last = tk.codec_logits(talker_params, hidden_last[:, None])[:, 0]

    code0, rest, is_eos, seen, key, codec_sum = _frame(
        talker_params, cp_params, talker_cfg, cp_cfg, sampling, suppress_mask,
        hidden_last, logits_last, seen0, key,
    )
    codes_buf, tokens_buf = _record(codes_buf, tokens_buf, jnp.int32(0), code0, rest, is_eos)
    return GenCarry(
        step=jnp.where(is_eos, 0, 1).astype(jnp.int32),
        eos=is_eos,
        cur_input=_next_input(
            cp_params, talker_params, trailing_embeds, trailing_len, tts_pad_embed,
            jnp.int32(0), code0, rest, codec_sum,
        ),
        cache=cache,
        offset=prefill_len,
        seen=seen,
        codes=codes_buf,
        tokens=tokens_buf,
        key=key,
    )


@functools.partial(
    jax.jit,
    static_argnames=("talker_cfg", "cp_cfg", "sampling"),
    donate_argnames=("carry",),
)
def generate_chunk(
    talker_params,
    cp_params,
    carry: GenCarry,
    *,
    talker_cfg: TalkerConfig,
    cp_cfg: CodePredictorConfig,
    sampling: SamplingConfig,
    trailing_embeds: jnp.ndarray,
    trailing_len: jnp.ndarray,
    tts_pad_embed: jnp.ndarray,
    until_step: jnp.ndarray,  # scalar int32: run while step < until_step
) -> GenCarry:
    """Advance the generation by up to (until_step - carry.step) frames."""
    suppress_mask = build_suppress_mask(
        talker_cfg.vocab_size, talker_cfg.codec_eos_token_id
    )
    max_frames = carry.codes.shape[0]
    limit = jnp.minimum(until_step, jnp.int32(max_frames))
    eos_id = talker_cfg.codec_eos_token_id
    use_tks = (
        _use_talker_sample_kernel(talker_params, talker_cfg, sampling)
        and carry.cache.k.shape[3] % 128 == 0
    )
    # with BOTH samplers in-kernel (TPU core PRNG), per-frame key material
    # is just two int32 words — derive them by counter mixing instead of
    # two threefry splits per frame (tens of serial VPU ops inside the
    # while_loop for nothing; the XLA fallback paths still need real keys)
    cheap_seeds = use_tks and _use_cp_kernel(cp_params, cp_cfg, talker_cfg, sampling)
    if use_tks:
        supp = suppress_mask
        if sampling.forbid_eos:
            supp = supp.at[eos_id].set(True)
        suppress_add = jnp.where(supp, jnp.float32(-1e30), jnp.float32(0.0))

    def cond(c: GenCarry):
        return jnp.logical_and(~c.eos, c.step < limit)

    def body(c: GenCarry) -> GenCarry:
        if use_tks:
            # whole talker step + final norm + codec head + code0 sampler as
            # one Pallas program (ops/talker_kernel.py sample mode)
            if cheap_seeds:
                sw = _seed_words(c.key)
                st = c.step.astype(jnp.int32)
                # distinct odd-constant streams per consumer per frame
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
            hidden_last, cache, code0 = tk.forward_step_sample(
                talker_params, talker_cfg, c.cur_input, c.cache, c.offset,
                seen=c.seen, suppress_add=suppress_add,
                seed=seed_tok,
                temperature=sampling.temperature, top_k=sampling.top_k,
                repetition_penalty=sampling.repetition_penalty,
                eos_token_id=None if sampling.forbid_eos else eos_id,
            )
            code0, rest, is_eos, seen, key, codec_sum = _frame(
                talker_params, cp_params, talker_cfg, cp_cfg, sampling,
                suppress_mask, hidden_last[:, 0], None, c.seen, key,
                code0=code0, k_cp=k_cp,
            )
        else:
            hidden, cache = tk.forward(
                talker_params, talker_cfg, c.cur_input, c.cache, c.offset
            )
            logits_last = tk.codec_logits(talker_params, hidden)[:, 0]
            code0, rest, is_eos, seen, key, codec_sum = _frame(
                talker_params, cp_params, talker_cfg, cp_cfg, sampling,
                suppress_mask, hidden[:, 0], logits_last, c.seen, c.key,
            )
        codes, tokens = _record(c.codes, c.tokens, c.step, code0, rest, is_eos)
        return GenCarry(
            step=c.step + jnp.where(is_eos, 0, 1),
            eos=is_eos,
            cur_input=_next_input(
                cp_params, talker_params, trailing_embeds, trailing_len, tts_pad_embed,
                c.step, code0, rest, codec_sum,
            ),
            cache=cache,
            offset=c.offset + 1,
            seen=seen,
            codes=codes,
            tokens=tokens,
            key=key,
        )

    return jax.lax.while_loop(cond, body, carry)


def generate_codes(
    talker_params,
    cp_params,
    *,
    talker_cfg: TalkerConfig,
    cp_cfg: CodePredictorConfig,
    sampling: SamplingConfig,
    prefill_embeds: jnp.ndarray,
    prefill_len: jnp.ndarray,
    trailing_embeds: jnp.ndarray,
    trailing_len: jnp.ndarray,
    tts_pad_embed: jnp.ndarray,
    cache: tk.KVCache | None = None,
    max_steps: jnp.ndarray = None,
    max_frames: int = 0,
    key: jax.Array = None,
    cache_len: int = 0,
    kv_quant: bool = False,
) -> GenResult:
    """Run the full AR synthesis loop for one utterance; returns codec codes.

    ``cache=None`` (single-chip production path): the KV cache is allocated
    *inside* the program from the static ``cache_len``/``kv_quant`` — the
    cache never exists as a host-visible input buffer, so the fused variant
    needs no donation (the cache is not an output, so a donated input could
    never alias and XLA warned "donated buffers were not usable" on every
    call). Mesh callers pass a pre-sharded ``cache`` so the sharding
    annotation propagates."""
    if cache is None:
        cache = tk.make_cache(
            talker_cfg, 1, cache_len, prefill_embeds.dtype, quantized=kv_quant
        )
    carry = prefill_start(
        talker_params,
        cp_params,
        talker_cfg=talker_cfg,
        cp_cfg=cp_cfg,
        sampling=sampling,
        prefill_embeds=prefill_embeds,
        prefill_len=prefill_len,
        trailing_embeds=trailing_embeds,
        trailing_len=trailing_len,
        tts_pad_embed=tts_pad_embed,
        cache=cache,
        max_frames=max_frames,
        key=key,
    )
    carry = generate_chunk(
        talker_params,
        cp_params,
        carry,
        talker_cfg=talker_cfg,
        cp_cfg=cp_cfg,
        sampling=sampling,
        trailing_embeds=trailing_embeds,
        trailing_len=trailing_len,
        tts_pad_embed=tts_pad_embed,
        until_step=jnp.asarray(max_steps, jnp.int32),
    )
    return GenResult(codes=carry.codes, n_frames=carry.step, tokens=carry.tokens)


# Non-streaming fast path: the whole utterance (prefill + full while_loop)
# as ONE compiled program — saves a device dispatch round-trip per utterance
# vs the prefill_start/generate_chunk pair (the tunnel RTT is material here).
# With cache=None (single-chip production default) the cache is in-program:
# nothing is donated and XLA's "donated buffers were not usable" warning
# (the cache can never alias an output — GenResult carries no cache) is
# gone from the hot path. Mesh callers still pass + donate an explicit
# pre-sharded cache: unaliasable, but donation frees it during execution.
generate_codes_fused = functools.partial(
    jax.jit,
    static_argnames=(
        "talker_cfg", "cp_cfg", "sampling", "max_frames", "cache_len", "kv_quant"
    ),
    donate_argnames=("cache",),
)(generate_codes)


def pad_to_bucket(length: int, buckets=(64, 128, 256, 384, 512, 768, 1024, 1536, 2048)):
    """Smallest bucket >= length (bounds jit recompiles across prompt sizes)."""
    for b in buckets:
        if length <= b:
            return b
    return ((length + 255) // 256) * 256
