"""CodePredictor: 5-layer MTP transformer predicting codebooks 2..16.

TPU-native re-design of the reference code predictor
(reference: Sources/Qwen3TTS/Models/CodePredictor.swift:198-344). Per talker
frame the reference runs a 2-token prefill (last hidden state + code-0 embed)
followed by 14 single-token AR steps, each with its own per-codebook
embedding table and LM head, syncing to the host after every step
(reference Qwen3.swift:674-705). Here the whole 15-step inner generation is
one fused on-device program: the per-codebook tables are stacked on a
leading axis and indexed by the ``lax.scan`` step counter, the KV cache is a
16-slot static buffer reset per frame, and sampling happens on device.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import CodePredictorConfig
from ..ops.norms import rms_norm, silu
from ..ops.rope import apply_rotary, rope_cos_sin
from ..ops.sampling import sample_token_inner
from .talker import _attend, _dense, _embed, _linear

Params = dict[str, Any]

# cache slots: 2 (prefill) + 14 (AR steps) = num_code_groups
def cache_len(cfg: CodePredictorConfig) -> int:
    return cfg.num_code_groups


class CPCache(NamedTuple):
    k: jnp.ndarray  # [L, B, H_kv, 16, D]
    v: jnp.ndarray


def make_cp_cache(cfg: CodePredictorConfig, batch: int, dtype=jnp.bfloat16) -> CPCache:
    shape = (
        cfg.num_hidden_layers,
        batch,
        cfg.num_key_value_heads,
        cache_len(cfg),
        cfg.head_dim,
    )
    return CPCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def init_code_predictor_params(
    key, cfg: CodePredictorConfig, talker_hidden_size: int, dtype=jnp.bfloat16
) -> Params:
    keys = jax.random.split(key, 8)
    L = cfg.num_hidden_layers
    h, hd = cfg.hidden_size, cfg.head_dim
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    n_emb = cfg.num_code_groups - 1  # 15

    def stack(k0, fn):
        return jax.vmap(fn)(jax.random.split(k0, L))

    layers = {
        "q_proj": stack(keys[0], lambda k: _linear(k, h, nq * hd, dtype)["w"]),
        "k_proj": stack(keys[0], lambda k: _linear(k, h, nkv * hd, dtype)["w"]),
        "v_proj": stack(keys[0], lambda k: _linear(k, h, nkv * hd, dtype)["w"]),
        "o_proj": stack(keys[0], lambda k: _linear(k, nq * hd, h, dtype)["w"]),
        "q_norm": jnp.ones((L, hd), dtype),
        "k_norm": jnp.ones((L, hd), dtype),
        "gate_proj": stack(keys[1], lambda k: _linear(k, h, cfg.intermediate_size, dtype)["w"]),
        "up_proj": stack(keys[1], lambda k: _linear(k, h, cfg.intermediate_size, dtype)["w"]),
        "down_proj": stack(keys[1], lambda k: _linear(k, cfg.intermediate_size, h, dtype)["w"]),
        "input_layernorm": jnp.ones((L, h), dtype),
        "post_attention_layernorm": jnp.ones((L, h), dtype),
    }
    params = {
        # per-codebook embeddings for codebooks 2..16: [15, vocab, talker_h]
        "codec_embedding": (
            jax.random.normal(keys[2], (n_emb, cfg.vocab_size, talker_hidden_size), jnp.float32)
            * 0.02
        ).astype(dtype),
        "layers": layers,
        "norm": jnp.ones((h,), dtype),
        # per-codebook LM heads: [15, hidden, vocab]
        "lm_head": (
            jax.random.normal(keys[3], (n_emb, h, cfg.vocab_size), jnp.float32) * 0.02
        ).astype(dtype),
    }
    if cfg.hidden_size != talker_hidden_size:
        params["small_to_mtp_projection"] = _linear(
            keys[4], talker_hidden_size, cfg.hidden_size, dtype, bias=True
        )
    return params


def _project(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    proj = params.get("small_to_mtp_projection")
    if proj is not None:
        return _dense(x, proj["w"]) + proj["b"]
    return x


def forward(
    params: Params,
    cfg: CodePredictorConfig,
    inputs_embeds: jnp.ndarray,  # [B, S, talker_h] (pre-projection)
    cache: CPCache,
    offset: jnp.ndarray,
):
    """One trunk pass (S tokens at cache position ``offset``).

    Returns (hidden [B, S, h], new_cache). The caller picks the LM head.
    """
    h0 = _project(params, inputs_embeds)
    B, S, _ = h0.shape
    T_max = cache.k.shape[3]

    positions = jnp.broadcast_to(
        (offset + jnp.arange(S, dtype=jnp.int32))[None], (B, S)
    )
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, h0.dtype)

    t_idx = jnp.arange(T_max, dtype=jnp.int32)
    q_pos = offset + jnp.arange(S, dtype=jnp.int32)
    mask = jnp.broadcast_to((t_idx[None, :] <= q_pos[:, None])[None], (B, S, T_max))

    scale = cfg.head_dim**-0.5
    nq, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    eps = cfg.rms_norm_eps

    def layer_fn(h, xs):
        p, k_cache, v_cache = xs
        x = rms_norm(h, p["input_layernorm"], eps)
        if "qkv_proj" in p:
            qkv = _dense(x, p["qkv_proj"])
            q = qkv[..., : nq * hd].reshape(B, S, nq, hd)
            k = qkv[..., nq * hd : (nq + nkv) * hd].reshape(B, S, nkv, hd)
            v = qkv[..., (nq + nkv) * hd :].reshape(B, S, nkv, hd)
        else:
            q = _dense(x, p["q_proj"]).reshape(B, S, nq, hd)
            k = _dense(x, p["k_proj"]).reshape(B, S, nkv, hd)
            v = _dense(x, p["v_proj"]).reshape(B, S, nkv, hd)
        q = rms_norm(q, p["q_norm"], eps)
        k = rms_norm(k, p["k_norm"], eps)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        q, k = apply_rotary(q, k, cos, sin)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, 0, offset, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, 0, offset, 0))
        attn = _attend(q, k_cache, v_cache, mask, scale)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nq * hd)
        h = h + _dense(attn, p["o_proj"])
        x = rms_norm(h, p["post_attention_layernorm"], eps)
        if "gate_up_proj" in p:
            gu = _dense(x, p["gate_up_proj"])
            half = gu.shape[-1] // 2
            gated = silu(gu[..., :half]) * gu[..., half:]
        else:
            gated = silu(_dense(x, p["gate_proj"])) * _dense(x, p["up_proj"])
        h = h + _dense(gated, p["down_proj"])
        return h, (k_cache, v_cache)

    h, (new_k, new_v) = jax.lax.scan(layer_fn, h0, (params["layers"], cache.k, cache.v))
    h = rms_norm(h, params["norm"], eps)
    return h, CPCache(new_k, new_v)


def head_logits(params: Params, hidden: jnp.ndarray, head_idx) -> jnp.ndarray:
    """LM head ``head_idx`` logits in float32. hidden: [B, h] -> [B, vocab].

    ``lm_head`` is stacked [15, h, vocab] (or a stacked PackedLinear for
    quantized checkpoints); head_idx may be a traced scan index.
    """
    return _dense(hidden.astype(jnp.float32), params["lm_head"][head_idx])


def predict_codes(
    params: Params,
    cfg: CodePredictorConfig,
    talker_params: Params,
    last_hidden: jnp.ndarray,  # [B, talker_h] talker hidden state at this frame
    code0: jnp.ndarray,  # [B] int32 first-codebook token
    key: jax.Array,
    *,
    temperature: float,
    top_k: int,
    top_p: float,
    ref_exact_top_p: bool = False,
    samp_vec: jnp.ndarray | None = None,  # [B, 4] per-row (t, k, p, rep)
) -> jnp.ndarray:
    """Generate codebooks 2..16 for one frame, fully on device.

    Returns codes [B, 15] int32. Mirrors the reference inner loop
    (Qwen3.swift:674-705): 2-token prefill with [hidden, codec_embed(code0)],
    then 14 AR steps, each sampling with the shared temperature/top-k/top-p
    but no repetition penalty / suppression / EOS handling.

    ``samp_vec`` (serving's per-request sampling mode) overrides the shared
    scalars with per-row values: column 0 temperature, 1 top_k, 2 top_p
    (column 3, the repetition penalty, is unused here — the reference's CP
    loop applies none either).
    """
    B = code0.shape[0]
    cache = make_cp_cache(cfg, B, last_hidden.dtype)

    def sample(logits, k):
        if samp_vec is not None:
            from ..ops.sampling import sample_token_vec

            return sample_token_vec(
                k, logits, temperature=samp_vec[:, 0],
                top_k=samp_vec[:, 1].astype(jnp.int32), top_p=samp_vec[:, 2],
                ref_exact_top_p=ref_exact_top_p,
            )
        return sample_token_inner(
            k, logits, temperature=temperature, top_k=top_k, top_p=top_p,
            ref_exact_top_p=ref_exact_top_p,
        )

    # prefill: [hidden, embed(code0)]
    code0_embed = _embed(talker_params["codec_embedding"], code0).astype(
        last_hidden.dtype
    )  # [B, talker_h]
    x0 = jnp.stack([last_hidden, code0_embed], axis=1)  # [B, 2, talker_h]
    h, cache = forward(params, cfg, x0, cache, jnp.int32(0))
    key, k0 = jax.random.split(key)
    code = sample(head_logits(params, h[:, -1], 0), k0)  # codebook index 1

    def step(carry, idx):
        cache, prev_code, key = carry
        key, kk = jax.random.split(key)
        emb = _embed(params["codec_embedding"][idx - 1], prev_code).astype(
            last_hidden.dtype
        )  # [B, talker_h]
        h, cache = forward(params, cfg, emb[:, None], cache, idx + 1)
        nxt = sample(head_logits(params, h[:, -1], idx), kk)
        return (cache, nxt, key), nxt

    idxs = jnp.arange(1, cfg.num_code_groups - 1, dtype=jnp.int32)  # 1..14
    (_, _, _), rest = jax.lax.scan(step, (cache, code, key), idxs)
    # codes for codebooks 2..16: [B, 15]
    return jnp.concatenate([code[None], rest], axis=0).T.astype(jnp.int32)


def sum_codec_embeddings(
    params: Params, talker_params: Params, code0: jnp.ndarray, rest_codes: jnp.ndarray
) -> jnp.ndarray:
    """Sum of all 16 codebook embeddings for the next talker input.

    code0: [B], rest_codes: [B, 15] -> [B, talker_h]
    (reference Qwen3.swift:720-728).
    """
    emb = _embed(talker_params["codec_embedding"], code0)
    # gather each codebook's embedding: tables [15, vocab, h], codes [B, 15]
    per_cb = jax.vmap(lambda tbl, c: _embed(tbl, c), in_axes=(0, 1), out_axes=1)(
        params["codec_embedding"], rest_codes
    )  # [B, 15, h]
    return (emb + per_cb.sum(axis=1).astype(emb.dtype)).astype(emb.dtype)
