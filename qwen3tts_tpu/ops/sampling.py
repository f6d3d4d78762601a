"""On-device token sampling.

Pure-functional logit pipeline replicating the reference sampler semantics
(reference: Sources/Qwen3TTS/Models/Qwen3.swift:68-213) but designed to live
*inside* the jitted decode loop — no host sync, no `.item()` readbacks:

  1. suppress invalid tokens (-inf via a static boolean mask)
  2. repetition penalty over previously generated ids (mul/div by sign)
  3. greedy argmax when temperature <= 0
  4. save the raw EOS logit
  5. top-k filter (before temperature, matching mlx_lm)
  6. top-p nucleus filter
  7. restore the raw EOS logit (EOS bypasses the filters)
  8. categorical sampling of logits * (1/temperature) via Gumbel trick

The repetition penalty uses a running boolean ``seen`` mask over the vocab
instead of the reference's per-step unique-token list — mathematically
identical (the penalty is applied to the set of unique generated ids).

The reference's top-p cumulates un-normalized ``exp(logits)``
(Qwen3.swift:92-117), which only matches nucleus sampling when the logits
are log-probabilities; we use a proper softmax by default. For bit-parity
runs against the reference, pass ``ref_exact_top_p=True`` (exposed as
``SamplingConfig.ref_exact_top_p`` and ``Qwen3TTSModel.ref_exact_top_p``)
to reproduce the reference's unnormalized cumsum exactly. Default
top_p == 1.0 disables the filter in both implementations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k largest logits, set the rest to -inf. logits: [..., V]."""
    v = logits.shape[-1]
    if k <= 0 or k >= v:
        return logits
    thresh = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits >= thresh, logits, NEG_INF)


def apply_top_p(logits: jnp.ndarray, p: float, ref_exact: bool = False) -> jnp.ndarray:
    """Nucleus filter: keep the smallest set of tokens with mass >= p.

    ``ref_exact`` reproduces the reference's behavior bit-for-bit: it
    cumulates UNNORMALIZED exp(logits) and compares against the absolute
    threshold (1 - p) (reference Qwen3.swift:92-117) — only meaningful when
    chasing bit-comparable output against the Swift/MLX implementation.
    """
    if p <= 0.0 or p >= 1.0:
        return logits
    if ref_exact:
        probs = jnp.exp(logits.astype(jnp.float32))
    else:
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    order = jnp.argsort(logits, axis=-1)  # ascending
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # invert the permutation to map cumulative mass back to vocab order
    inv = jnp.argsort(order, axis=-1)
    cum_orig = jnp.take_along_axis(cum, inv, axis=-1)
    return jnp.where(cum_orig > (1.0 - p), logits, NEG_INF)


def apply_repetition_penalty(
    logits: jnp.ndarray, seen: jnp.ndarray, penalty: float
) -> jnp.ndarray:
    """Penalize every vocab id marked in ``seen`` (bool [V])."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(seen, penalized, logits)


@partial(jax.jit, static_argnames=("temperature", "top_k", "top_p", "repetition_penalty"))
def sample_token(
    key: jax.Array,
    logits: jnp.ndarray,
    *,
    temperature: float = 0.9,
    top_k: int = 50,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
    seen: jnp.ndarray | None = None,
    suppress_mask: jnp.ndarray | None = None,
    eos_token_id: int | None = None,
) -> jnp.ndarray:
    """Sample next token ids from raw logits [..., V] -> int32 [...]."""
    return sample_token_inner(
        key,
        logits,
        temperature=temperature,
        top_k=top_k,
        top_p=top_p,
        repetition_penalty=repetition_penalty,
        seen=seen,
        suppress_mask=suppress_mask,
        eos_token_id=eos_token_id,
    )


def sample_token_inner(
    key: jax.Array,
    logits: jnp.ndarray,
    *,
    temperature: float,
    top_k: int,
    top_p: float,
    repetition_penalty: float = 1.0,
    seen: jnp.ndarray | None = None,
    suppress_mask: jnp.ndarray | None = None,
    eos_token_id: int | None = None,
    ref_exact_top_p: bool = False,
) -> jnp.ndarray:
    """Un-jitted sampler body, for composition inside larger jitted loops."""
    logits = logits.astype(jnp.float32)

    if suppress_mask is not None:
        logits = jnp.where(suppress_mask, NEG_INF, logits)
    if seen is not None:
        logits = apply_repetition_penalty(logits, seen, repetition_penalty)

    if temperature <= 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if eos_token_id is not None:
        eos_logit = logits[..., eos_token_id]

    logits = apply_top_k(logits, top_k)
    logits = apply_top_p(logits, top_p, ref_exact=ref_exact_top_p)

    if eos_token_id is not None:
        logits = logits.at[..., eos_token_id].set(eos_logit)

    return jax.random.categorical(key, logits * (1.0 / temperature), axis=-1).astype(
        jnp.int32
    )


def sample_token_vec(
    key: jax.Array,
    logits: jnp.ndarray,  # [B, V]
    *,
    temperature: jnp.ndarray,  # [B] float32
    top_k: jnp.ndarray,  # [B] int32
    top_p: jnp.ndarray | None = None,  # [B] float32 (None: filter disabled)
    repetition_penalty: jnp.ndarray | None = None,  # [B] float32
    seen: jnp.ndarray | None = None,  # [B, V] bool
    suppress_mask: jnp.ndarray | None = None,  # [V] bool
    eos_token_id: int | None = None,
    ref_exact_top_p: bool = False,
) -> jnp.ndarray:
    """Batched sampler with PER-ROW parameters (serving's per-request
    sampling mode). Row b follows ``sample_token_inner`` with that row's
    scalars exactly — same filter order (suppress → penalty → greedy-or →
    top-k → top-p → EOS restore → temperature-scaled categorical), same
    disable semantics (temperature <= 0 greedy, top_k outside (0, V) off,
    top_p outside (0, 1) off). Parity is pinned per-row against the scalar
    sampler in tests/test_ops.py.

    The per-row top-k threshold comes from one ascending sort (the k-th
    largest is sorted[V - k]) instead of ``lax.top_k`` (static k only);
    with ties this keeps every logit >= the threshold, exactly like the
    scalar path. Costs one [B, V] sort (+ one more when ``top_p`` is
    given) per step — the price of parameter generality; the megakernel
    samplers stay on the service-wide scalar path.
    """
    logits = logits.astype(jnp.float32)
    B, V = logits.shape
    if suppress_mask is not None:
        logits = jnp.where(suppress_mask, NEG_INF, logits)
    if repetition_penalty is not None and seen is not None:
        pen = repetition_penalty[:, None]
        penalized = jnp.where(logits < 0, logits * pen, logits / pen)
        logits = jnp.where(seen, penalized, logits)
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if eos_token_id is not None:
        eos_logit = logits[:, eos_token_id]

    k = jnp.clip(top_k.astype(jnp.int32), 1, V)
    kth = jnp.take_along_axis(jnp.sort(logits, axis=-1), (V - k)[:, None], axis=-1)
    no_k = (top_k <= 0) | (top_k >= V)
    logits = jnp.where(no_k[:, None] | (logits >= kth), logits, NEG_INF)

    if top_p is not None:
        # identical math to apply_top_p, thresholded per row
        if ref_exact_top_p:
            probs = jnp.exp(logits)
        else:
            probs = jax.nn.softmax(logits, axis=-1)
        order = jnp.argsort(logits, axis=-1)
        cum = jnp.cumsum(jnp.take_along_axis(probs, order, axis=-1), axis=-1)
        inv = jnp.argsort(order, axis=-1)
        cum_orig = jnp.take_along_axis(cum, inv, axis=-1)
        keep = ((top_p >= 1.0) | (top_p <= 0.0))[:, None] | (
            cum_orig > (1.0 - top_p[:, None])
        )
        logits = jnp.where(keep, logits, NEG_INF)

    if eos_token_id is not None:
        logits = logits.at[:, eos_token_id].set(eos_logit)
    temp_safe = jnp.where(temperature > 0, temperature, 1.0)
    sampled = jax.random.categorical(
        key, logits * (1.0 / temp_safe)[:, None], axis=-1
    ).astype(jnp.int32)
    return jnp.where(temperature <= 0, greedy_tok, sampled)


def build_suppress_mask(vocab_size: int, eos_token_id: int, n_special: int = 1024):
    """Static mask over the last ``n_special`` vocab ids except EOS.

    Reference builds this list per call (Qwen3.swift:622-627); here it is a
    constant folded into the compiled step.
    """
    import numpy as np

    mask = np.zeros((vocab_size,), dtype=bool)
    mask[vocab_size - n_special :] = True
    mask[eos_token_id] = False
    return jnp.asarray(mask)
