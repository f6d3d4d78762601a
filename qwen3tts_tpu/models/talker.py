"""Talker: the main autoregressive MRoPE transformer.

TPU-native re-design of the reference Talker
(reference: Sources/Qwen3TTS/Models/Talker.swift:157-651):

* Parameters are plain pytrees (nested dicts of jnp arrays); all forwards are
  pure functions — no module mutation, no lazy-eval sync points.
* The 28 decoder layers are **stacked on a leading axis and driven by
  ``lax.scan``**, so the compiled program has one layer body regardless of
  depth (fast compiles, identical numerics).
* The KV cache is a preallocated static-shape buffer ``[L, B, H_kv, T_max, D]``
  updated with ``dynamic_update_slice`` inside the jitted step; sequence
  validity is handled by masking, never by dynamic shapes.
* Per-layer pruned MLP widths (edge checkpoints,
  reference Talker.swift:513-518) are supported by zero-padding gate/up/down
  projections to the maximum width — zero columns contribute exactly zero
  through SwiGLU, so numerics are unchanged while ``scan`` stays rectangular.

Linear weights are stored as ``[in, out]`` (``y = x @ w``), the natural MXU
layout; the checkpoint loader transposes from PyTorch's ``[out, in]``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TalkerConfig
from ..ops.norms import rms_norm, silu
from ..ops.rope import apply_rotary, mrope_cos_sin

Params = dict[str, Any]


class KVCache(NamedTuple):
    """Static-shape KV cache. k/v: [L, B, H_kv, T_max, D]."""

    k: jnp.ndarray
    v: jnp.ndarray

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return False


class KVCacheQ(NamedTuple):
    """int8 KV cache with per-row (per head per slot) f32 scales.

    Halves attention's HBM read traffic vs bf16 — the dominant per-sequence
    cost of batched decode (at B=32 the bf16 KV stream was ~470 MB/frame vs
    440 MB of weights, tools/microbench_batch.py). k/v: int8
    [L, B, H_kv, T_max, D]; ks/vs: f32 [L, B, H_kv, T_max], row scale =
    amax/127 at append time. Opt-in (``kv_cache_dtype="int8"``): int8
    rounding perturbs attention by ~0.4% relative — fine for serving, but
    parity tests pin the bf16 default.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    ks: jnp.ndarray
    vs: jnp.ndarray

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return True


def quantize_kv_rows(x: jnp.ndarray):
    """Per-row symmetric int8: x [..., D] -> (int8 [..., D], f32 scale [...])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax * (1.0 / 127.0), 1e-12)
    q = jnp.round(xf / scale[..., None]).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16):
    """Inverse of :func:`quantize_kv_rows` (q [..., D], scale [...])."""
    return (q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)).astype(dtype)


def make_cache(
    cfg: TalkerConfig,
    batch: int,
    max_len: int,
    dtype=jnp.bfloat16,
    *,
    quantized: bool = False,
) -> KVCache | KVCacheQ:
    shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
    if quantized:
        return KVCacheQ(
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape[:-1], jnp.float32),
            jnp.zeros(shape[:-1], jnp.float32),
        )
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


# ---------------------------------------------------------------------------
# Parameter initialization (synthetic weights for tests / benchmarks)
# ---------------------------------------------------------------------------


def _linear(key, d_in, d_out, dtype, bias=False, scale=None):
    scale = scale if scale is not None else 1.0 / np.sqrt(d_in)
    p = {"w": (jax.random.normal(key, (d_in, d_out), jnp.float32) * scale).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_talker_params(key, cfg: TalkerConfig, dtype=jnp.bfloat16) -> Params:
    """Random Talker parameters at the configured shapes (stacked layers)."""
    keys = jax.random.split(key, 16)
    L = cfg.num_hidden_layers
    h, hd = cfg.hidden_size, cfg.head_dim
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    inter = max(
        cfg.layer_intermediate_size(i) for i in range(L)
    )

    def stack(fn):
        return jax.vmap(fn)(jax.random.split(keys[0], L))

    layers = {
        "q_proj": stack(lambda k: _linear(k, h, nq * hd, dtype)["w"]),
        "k_proj": stack(lambda k: _linear(k, h, nkv * hd, dtype)["w"]),
        "v_proj": stack(lambda k: _linear(k, h, nkv * hd, dtype)["w"]),
        "o_proj": stack(lambda k: _linear(k, nq * hd, h, dtype)["w"]),
        "q_norm": jnp.ones((L, hd), dtype),
        "k_norm": jnp.ones((L, hd), dtype),
        "gate_proj": stack(lambda k: _linear(k, h, inter, dtype)["w"]),
        "up_proj": stack(lambda k: _linear(k, h, inter, dtype)["w"]),
        "down_proj": stack(lambda k: _linear(k, inter, h, dtype)["w"]),
        "input_layernorm": jnp.ones((L, h), dtype),
        "post_attention_layernorm": jnp.ones((L, h), dtype),
    }
    params = {
        "codec_embedding": jax.random.normal(keys[1], (cfg.vocab_size, h), jnp.float32)
        .astype(dtype)
        * 0.02,
        "text_embedding": jax.random.normal(
            keys[2], (cfg.text_vocab_size, cfg.text_hidden_size), jnp.float32
        ).astype(dtype)
        * 0.02,
        "layers": layers,
        "norm": jnp.ones((h,), dtype),
        "text_projection": {
            "fc1": _linear(keys[3], cfg.text_hidden_size, cfg.text_hidden_size, dtype, bias=True),
            "fc2": _linear(keys[4], cfg.text_hidden_size, h, dtype, bias=True),
        },
        "codec_head": _linear(keys[5], h, cfg.vocab_size, dtype)["w"],
    }
    if cfg.per_layer_intermediate_sizes is not None:
        # zero out the pruned tail of each layer's MLP
        mask = np.zeros((L, inter), dtype=bool)
        for i, sz in enumerate(cfg.per_layer_intermediate_sizes):
            mask[i, :sz] = True
        m = jnp.asarray(mask)
        layers["gate_proj"] = jnp.where(m[:, None, :], layers["gate_proj"], 0)
        layers["up_proj"] = jnp.where(m[:, None, :], layers["up_proj"], 0)
        layers["down_proj"] = jnp.where(m[:, :, None], layers["down_proj"], 0)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _dense(x, w):
    """y = x @ w, where w is either a plain [in, out] array or a
    :class:`~qwen3tts_tpu.ops.quant.PackedLinear` (int4/int8 MLX affine
    layout kept packed).

    Single-token packed matmuls use the Pallas dequant-in-matmul kernel on
    TPU (4x less HBM traffic — the decode loop is weight-bandwidth-bound);
    multi-token/CPU falls back to the XLA dequant path. Int8Linear (runtime
    weight-only quantization, ops/quant.py) runs as a plain XLA dot with the
    int8->activation-dtype convert fused into the operand load.
    """
    from ..ops.quant import Int8Linear, PackedLinear, int8_matmul, quant_matmul, quant_matmul_pallas

    if isinstance(w, Int8Linear):
        return int8_matmul(x, w)
    if isinstance(w, PackedLinear):
        lead = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1])
        use_pallas = (
            flat.shape[0] == 1
            and jax.devices()[0].platform in ("tpu", "axon")
            and (x.shape[-1] // (32 // w.bits)) % 128 == 0
        )
        fn = quant_matmul_pallas if use_pallas else quant_matmul
        y = fn(flat, w.q, w.scales, w.biases, bits=w.bits, group=w.group)
        return y.reshape(*lead, y.shape[-1]).astype(x.dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def resize_mlp(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Text projection MLP: fc2(silu(fc1(x))) (reference Talker.swift:475-487)."""
    h = _dense(x, params["fc1"]["w"]) + params["fc1"]["b"]
    h = silu(h)
    return _dense(h, params["fc2"]["w"]) + params["fc2"]["b"]


def _embed(table, ids: jnp.ndarray) -> jnp.ndarray:
    from ..ops.quant import PackedLinear, embed_lookup

    if isinstance(table, PackedLinear):
        return embed_lookup(table, ids)
    return table[ids]


def embed_text(params: Params, cfg: TalkerConfig, ids: jnp.ndarray) -> jnp.ndarray:
    """Token-map-aware text embedding lookup (reference Talker.swift:627-633)."""
    token_map = params.get("text_token_map")
    if token_map is not None:
        ids = token_map[ids]
    return _embed(params["text_embedding"], ids)


def embed_codec(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return _embed(params["codec_embedding"], ids)



def _project_qkv(p, x, B, S, nq, nkv, hd, eps):
    """Shared q/k/v projection block: fused-or-separate matmuls + QK-RMSNorm,
    transposed to [B, H, S, D] (pre-rotary). Used by every forward variant."""
    if "qkv_proj" in p:
        qkv = _dense(x, p["qkv_proj"])
        q = qkv[..., : nq * hd].reshape(B, S, nq, hd)
        k = qkv[..., nq * hd : (nq + nkv) * hd].reshape(B, S, nkv, hd)
        v = qkv[..., (nq + nkv) * hd :].reshape(B, S, nkv, hd)
    else:
        q = _dense(x, p["q_proj"]).reshape(B, S, nq, hd)
        k = _dense(x, p["k_proj"]).reshape(B, S, nkv, hd)
        v = _dense(x, p["v_proj"]).reshape(B, S, nkv, hd)
    q = rms_norm(q, p["q_norm"], eps).transpose(0, 2, 1, 3)
    k = rms_norm(k, p["k_norm"], eps).transpose(0, 2, 1, 3)
    return q, k, v.transpose(0, 2, 1, 3)


def _swiglu_mlp(p, x):
    """Shared SwiGLU block (fused-or-separate gate/up), returns gated value
    pre-down-projection so callers can also record activation stats."""
    if "gate_up_proj" in p:
        gu = _dense(x, p["gate_up_proj"])
        half = gu.shape[-1] // 2
        return silu(gu[..., :half]) * gu[..., half:]
    return silu(_dense(x, p["gate_proj"])) * _dense(x, p["up_proj"])


def fuse_layer_projections(layers: Params) -> Params:
    """Fuse q/k/v -> qkv_proj and gate/up -> gate_up_proj (one matmul each).

    NOTE: measured ~30% slower than unfused for B=1 decode on v5e (XLA's
    matvec codegen prefers narrower matmuls) — kept as an experimental
    option, default OFF. Works for dense stacked
    weights [L, in, out] (concat on out) and for stacked PackedLinears
    (concat on the O axis — MLX affine groups are per-output-row, so packing
    is preserved exactly). forward() uses the fused path when present.
    """
    from ..ops.quant import PackedLinear

    out = dict(layers)

    def cat(ws):
        if isinstance(ws[0], PackedLinear):
            return PackedLinear(
                jnp.concatenate([w.q for w in ws], axis=-2),
                jnp.concatenate([w.scales for w in ws], axis=-2),
                jnp.concatenate([w.biases for w in ws], axis=-2),
                ws[0].bits,
                ws[0].group,
            )
        return jnp.concatenate(ws, axis=-1)

    out["qkv_proj"] = cat([layers["q_proj"], layers["k_proj"], layers["v_proj"]])
    out["gate_up_proj"] = cat([layers["gate_proj"], layers["up_proj"]])
    for name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        del out[name]
    return out


def _attend(q, k, v, mask, scale):
    """GQA attention. q: [B, Hq, S, D], k/v: [B, Hkv, T, D], mask: [B, S, T]."""
    B, Hq, S, D = q.shape
    Hkv = k.shape[1]
    group = Hq // Hkv
    qg = q.reshape(B, Hkv, group, S, D)
    scores = jnp.einsum(
        "bhgsd,bhtd->bhgst", qg, k, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(mask[:, None, None], scores, np.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgst,bhtd->bhgsd", probs, v, preferred_element_type=jnp.float32)
    return out.reshape(B, Hq, S, D).astype(q.dtype)


def _kernel_mode(params) -> str:
    """Matmul mode for the whole-step kernel: layout-driven, with
    QWEN3TTS_TK_MODE=dyn_int8 opting the int8 layout into s8xs8 MXU
    matvecs (dynamic per-step activation quantization)."""
    import os

    from ..ops.talker_kernel import _layout

    if _layout(params["layers"]) != "int8":
        return "bf16"
    return os.environ.get("QWEN3TTS_TK_MODE", "wo_bf16")


def _append_cache_rows(cache, k_new, v_new, offset):
    """Append one decode step's k/v rows ([L, B, H_kv, D]) at ``offset``
    (scalar, shared by the batch), quantizing when the cache is int8."""
    if cache.quantized:
        kq, ksc = quantize_kv_rows(k_new)
        vq, vsc = quantize_kv_rows(v_new)
        return KVCacheQ(
            jax.lax.dynamic_update_slice(
                cache.k, kq[:, :, :, None, :], (0, 0, 0, offset, 0)
            ),
            jax.lax.dynamic_update_slice(
                cache.v, vq[:, :, :, None, :], (0, 0, 0, offset, 0)
            ),
            jax.lax.dynamic_update_slice(
                cache.ks, ksc[:, :, :, None], (0, 0, 0, offset)
            ),
            jax.lax.dynamic_update_slice(
                cache.vs, vsc[:, :, :, None], (0, 0, 0, offset)
            ),
        )
    return KVCache(
        jax.lax.dynamic_update_slice(
            cache.k, k_new[:, :, :, None, :].astype(cache.k.dtype), (0, 0, 0, offset, 0)
        ),
        jax.lax.dynamic_update_slice(
            cache.v, v_new[:, :, :, None, :].astype(cache.v.dtype), (0, 0, 0, offset, 0)
        ),
    )


def forward(
    params: Params,
    cfg: TalkerConfig,
    inputs_embeds: jnp.ndarray,  # [B, S, h]
    cache: KVCache,
    offset: jnp.ndarray,  # scalar int32: number of valid cache entries
    *,
    seq_len: jnp.ndarray | None = None,  # scalar: valid tokens in this block
):
    """Run the talker trunk, updating the KV cache in place.

    Works for both prefill (S > 1, right-padded to a bucket; ``seq_len`` is
    the number of real tokens) and single-token decode (S == 1). Returns
    (hidden [B, S, h], new_cache).
    """
    B, S, _ = inputs_embeds.shape
    T_max = cache.max_len
    quantized = cache.quantized
    if seq_len is None:
        seq_len = jnp.int32(S)

    positions = offset + jnp.arange(S, dtype=jnp.int32)[None]  # [B==1 broadcast, S]
    positions = jnp.broadcast_to(positions, (B, S))
    cos, sin = mrope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, cfg.mrope_section, inputs_embeds.dtype
    )

    # mask[b, s, t]: query at global pos offset+s may attend cache slot t
    t_idx = jnp.arange(T_max, dtype=jnp.int32)
    q_pos = offset + jnp.arange(S, dtype=jnp.int32)
    mask = t_idx[None, :] <= q_pos[:, None]  # causal over the whole cache
    mask = jnp.broadcast_to(mask[None], (B, S, T_max))

    scale = cfg.head_dim**-0.5
    nq, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    eps = cfg.rms_norm_eps

    import os

    # Fused whole-step Pallas kernel (ops/talker_kernel.py): all L layers as
    # one grid program with double-buffered weight streaming. Covers the
    # B=1, S=1 decode hot path for both fused layouts (Int8Linear serving
    # and dense-bf16 fused projections).
    if (
        S == 1
        and B == 1
        and T_max % 128 == 0
        and jax.devices()[0].platform in ("tpu", "axon")
        and not os.environ.get("QWEN3TTS_NO_TALKER_KERNEL")
    ):
        from ..ops.talker_kernel import _layout, step_supported, talker_decode_step

        if step_supported(params, cfg):
            mode = _kernel_mode(params)
            h, k_new, v_new = talker_decode_step(
                params, cfg, inputs_embeds, cache.k, cache.v, offset, cos, sin,
                mode=mode,
                k_scale=cache.ks if quantized else None,
                v_scale=cache.vs if quantized else None,
            )
            h = rms_norm(h, params["norm"], eps)
            return h, _append_cache_rows(cache, k_new, v_new, offset)

    # Prefix-streaming kernel economics (re-measured round 2 with the
    # all-heads stripe kernel, ops/attention.py): at T<=2048 right-sized
    # caches the attention op is ~20us and overhead-bound — XLA ties or
    # wins, so production per-utterance caches stay on the XLA path. At
    # T>=4096 fixed server caches the kernel wins short prefixes
    # (0.165 vs 0.188 ms/layer at pos~64) and ties full ones
    # (0.177 vs 0.178 at pos~4000); the round-1 per-head kernel's long-
    # prefix pathology (4.89 vs 2.83 ms/step) is gone.
    use_attn_kernel = (
        S == 1
        and B == 1
        and T_max % 128 == 0
        and T_max >= 4096
        and not quantized  # the standalone kernel streams bf16 caches only
        and jax.devices()[0].platform in ("tpu", "axon")
        and not os.environ.get("QWEN3TTS_NO_PALLAS_ATTN")
    )

    # The cache rides the scan CARRY (not xs/ys): carried buffers are updated
    # with dynamic_update_slice in place, whereas scan ys would allocate and
    # copy a fresh full-cache output every step (measured +1.5 ms/step at a
    # 2048-row cache on v5e).
    def layer_fn(carry, xs):
        h, cc = carry  # cc: cache leaves tuple (k, v[, ks, vs])
        p, idx = xs
        x = rms_norm(h, p["input_layernorm"], eps)
        q, k, v = _project_qkv(p, x, B, S, nq, nkv, hd, eps)
        q, k = apply_rotary(q, k, cos, sin)

        if quantized:
            k_all, v_all, ks_all, vs_all = cc
            kq, ksc = quantize_kv_rows(k)  # k [B, nkv, S, D]
            vq, vsc = quantize_kv_rows(v)
            k_all = jax.lax.dynamic_update_slice(k_all, kq[None], (idx, 0, 0, offset, 0))
            v_all = jax.lax.dynamic_update_slice(v_all, vq[None], (idx, 0, 0, offset, 0))
            ks_all = jax.lax.dynamic_update_slice(ks_all, ksc[None], (idx, 0, 0, offset))
            vs_all = jax.lax.dynamic_update_slice(vs_all, vsc[None], (idx, 0, 0, offset))
            k_cache = dequantize_kv(
                jax.lax.dynamic_index_in_dim(k_all, idx, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(ks_all, idx, 0, keepdims=False),
            )
            v_cache = dequantize_kv(
                jax.lax.dynamic_index_in_dim(v_all, idx, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(vs_all, idx, 0, keepdims=False),
            )
            attn = _attend(q, k_cache, v_cache, mask, scale)
            cc = (k_all, v_all, ks_all, vs_all)
        else:
            k_all, v_all = cc
            k_all = jax.lax.dynamic_update_slice(k_all, k[None], (idx, 0, 0, offset, 0))
            v_all = jax.lax.dynamic_update_slice(v_all, v[None], (idx, 0, 0, offset, 0))
            if use_attn_kernel:
                # Pallas path: prefix-only flash attention over the HBM cache
                # (ops/attention.py), reading this layer's slice via DMA
                from ..ops.attention import decode_attention_inner

                attn = decode_attention_inner(q, k_all, v_all, offset, scale, layer=idx)
            else:
                k_cache = jax.lax.dynamic_index_in_dim(k_all, idx, 0, keepdims=False)
                v_cache = jax.lax.dynamic_index_in_dim(v_all, idx, 0, keepdims=False)
                attn = _attend(q, k_cache, v_cache, mask, scale)
            cc = (k_all, v_all)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nq * hd)
        h = h + _dense(attn, p["o_proj"])

        x = rms_norm(h, p["post_attention_layernorm"], eps)
        h = h + _dense(_swiglu_mlp(p, x), p["down_proj"])
        return (h, cc), None

    L = cfg.num_hidden_layers
    (h, new_cc), _ = jax.lax.scan(
        layer_fn,
        (inputs_embeds, tuple(cache)),
        (params["layers"], jnp.arange(L, dtype=jnp.int32)),
    )
    h = rms_norm(h, params["norm"], eps)
    return h, type(cache)(*new_cc)


def forward_step_sample(
    params: Params,
    cfg: TalkerConfig,
    inputs_embeds: jnp.ndarray,  # [1, 1, h]
    cache: KVCache,
    offset: jnp.ndarray,  # scalar int32
    *,
    seen: jnp.ndarray,  # [vocab] bool
    suppress_add: jnp.ndarray,  # [vocab] f32 additive mask (-1e30 suppressed)
    seed: jnp.ndarray,  # [2] int32 PRNG seed words
    temperature: float,
    top_k: int,
    repetition_penalty: float,
    eos_token_id: int | None,
):
    """Decode step + codec head + code0 sampler as ONE Pallas program.

    Only valid when ``forward`` would take the fused-kernel path (caller
    gates on ``ops.talker_kernel.step_supported``). Returns
    (hidden [1, 1, h] post-final-norm, new_cache, code0 [1] int32)."""
    from ..ops.talker_kernel import _layout, talker_decode_step

    positions = jnp.broadcast_to(offset[None, None], (1, 1)).astype(jnp.int32)
    cos, sin = mrope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, cfg.mrope_section,
        inputs_embeds.dtype,
    )
    h, k_new, v_new, code0 = talker_decode_step(
        params, cfg, inputs_embeds, cache.k, cache.v, offset, cos, sin,
        mode=_kernel_mode(params),
        sample=dict(
            temperature=float(temperature),
            top_k=int(top_k),
            rep_penalty=float(repetition_penalty),
            eos_id=-1 if eos_token_id is None else int(eos_token_id),
        ),
        seed=seed,
        suppress_add=suppress_add[None],
        seen=seen[None],
        k_scale=cache.ks if cache.quantized else None,
        v_scale=cache.vs if cache.quantized else None,
    )
    return h, _append_cache_rows(cache, k_new, v_new, offset), code0


def _scatter_append_batched(cache, cfg: TalkerConfig, k_new, v_new, offsets):
    """Append each sequence's new k/v row ([L, B, Hkv, D]) at its own cache
    offset (quantizes rows first for int8 caches).

    Implemented as a chain of per-sequence ``dynamic_update_slice`` ops
    rather than one gather-scatter: XLA provably aliases a DUS chain in
    place inside the decode ``while_loop``, whereas the batched
    ``.at[ll, bb, hh, off_b].set()`` scatter materialized a full cache
    copy every frame — measured 1.03 ms/frame at B=32 on a
    [28, 32, 8, 256, 128] bf16 cache (tools/microbench_batch.py
    `scatter`, 2026-08-18). Benched alone in a fresh process the chain
    itself is free (~0.002 ms/frame, 2026-08-20) — earlier 0.5-1.0 ms
    readings of it were a measurement-order artifact; see
    tools/exp_kv_append.py for the diagnosis and the (no-win) Pallas
    tile-RMW alternative."""
    B = k_new.shape[1]

    def dus_chain(buf, rows):
        """rows [L, B, Hkv, D] into buf [L, B, Hkv, T, D] at (b, offsets[b])."""
        for b in range(B):
            buf = jax.lax.dynamic_update_slice(
                buf, rows[:, b : b + 1, :, None], (0, b, 0, offsets[b], 0)
            )
        return buf

    def dus_chain_scales(buf, rows):
        """rows [L, B, Hkv] into buf [L, B, Hkv, T] at (b, offsets[b])."""
        for b in range(B):
            buf = jax.lax.dynamic_update_slice(
                buf, rows[:, b : b + 1, :, None], (0, b, 0, offsets[b])
            )
        return buf

    if cache.quantized:
        kq, ksc = quantize_kv_rows(k_new)  # [L, B, Hkv, D] -> + [L, B, Hkv]
        vq, vsc = quantize_kv_rows(v_new)
        return KVCacheQ(
            dus_chain(cache.k, kq),
            dus_chain(cache.v, vq),
            dus_chain_scales(cache.ks, ksc),
            dus_chain_scales(cache.vs, vsc),
        )
    return KVCache(
        dus_chain(cache.k, k_new),
        dus_chain(cache.v, v_new),
    )


def forward_batched_step_sample(
    params: Params,
    cfg: TalkerConfig,
    inputs_embeds: jnp.ndarray,  # [B, 1, h]
    cache: KVCache,
    offsets: jnp.ndarray,  # [B] int32: per-sequence cache positions
    *,
    seen: jnp.ndarray,  # [B, vocab] bool
    suppress_add: jnp.ndarray,  # [vocab] f32 additive mask (-1e30 suppressed)
    seed: jnp.ndarray,  # [2] int32 PRNG seed words
    temperature: float,
    top_k: int,
    repetition_penalty: float,
    eos_token_id: int | None,
):
    """Batched decode step + codec head + per-row code0 sampler as ONE
    Pallas program (the batched twin of :func:`forward_step_sample`).

    Only valid when ``forward_batched_step`` would take the fused-kernel
    path (caller gates on ``ops.talker_kernel.step_supported(batch=B)``).
    Returns (hidden [B, 1, h] post-final-norm, new_cache, code0 [B])."""
    from ..ops.talker_kernel import talker_decode_step

    positions = offsets[:, None].astype(jnp.int32)
    cos, sin = mrope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, cfg.mrope_section,
        inputs_embeds.dtype,
    )
    h, k_new, v_new, code0 = talker_decode_step(
        params, cfg, inputs_embeds, cache.k, cache.v, offsets, cos, sin,
        mode=_kernel_mode(params),
        sample=dict(
            temperature=float(temperature),
            top_k=int(top_k),
            rep_penalty=float(repetition_penalty),
            eos_id=-1 if eos_token_id is None else int(eos_token_id),
        ),
        seed=seed,
        suppress_add=suppress_add[None],
        seen=seen,
        k_scale=cache.ks if cache.quantized else None,
        v_scale=cache.vs if cache.quantized else None,
    )
    return h, _scatter_append_batched(cache, cfg, k_new, v_new, offsets), code0


def forward_batched_step(
    params: Params,
    cfg: TalkerConfig,
    inputs_embeds: jnp.ndarray,  # [B, 1, h]
    cache: KVCache,
    offsets: jnp.ndarray,  # [B] int32: per-sequence cache positions
):
    """Single-token decode for a BATCH of sequences at different positions.

    Like :func:`forward` with S=1, but each sequence writes its k/v at its
    own offset (scatter) and masks its own prefix — the batched-serving
    path (models/batch_generate.py). Returns (hidden [B, 1, h], new_cache).
    """
    B, S, _ = inputs_embeds.shape
    assert S == 1, "forward_batched_step is single-token decode only"
    T_max = cache.max_len

    positions = offsets[:, None].astype(jnp.int32)  # [B, 1]
    cos, sin = mrope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, cfg.mrope_section, inputs_embeds.dtype
    )

    import os

    # Batched whole-step Pallas kernel: same grid program as the B=1 path
    # with per-sequence offsets (ops/talker_kernel.py) — one weight stream
    # serves the whole batch.
    if (
        T_max % 128 == 0
        and jax.devices()[0].platform in ("tpu", "axon")
        and not os.environ.get("QWEN3TTS_NO_TALKER_KERNEL")
    ):
        from ..ops.talker_kernel import _layout, step_supported, talker_decode_step

        if step_supported(params, cfg, batch=B, kv_quant=cache.quantized):
            mode = _kernel_mode(params)
            h, k_new, v_new = talker_decode_step(
                params, cfg, inputs_embeds, cache.k, cache.v, offsets, cos, sin,
                mode=mode,
                k_scale=cache.ks if cache.quantized else None,
                v_scale=cache.vs if cache.quantized else None,
            )
            h = rms_norm(h, params["norm"], cfg.rms_norm_eps)  # [B, 1, h]
            return h, _scatter_append_batched(cache, cfg, k_new, v_new, offsets)

    t_idx = jnp.arange(T_max, dtype=jnp.int32)
    mask = t_idx[None, None, :] <= offsets[:, None, None]  # [B, 1, T]

    scale = cfg.head_dim**-0.5
    nq, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    eps = cfg.rms_norm_eps

    quantized = cache.quantized

    def layer_fn(carry, xs):
        h, cc = carry  # cache leaves tuple (k, v[, ks, vs])
        p, idx = xs
        x = rms_norm(h, p["input_layernorm"], eps)
        q, k, v = _project_qkv(p, x, B, S, nq, nkv, hd, eps)
        q, k = apply_rotary(q, k, cos, sin)

        # per-sequence append: k_all[idx, b, :, offsets[b], :] = k — a DUS
        # chain over b (in-place under the scan carry), not a gather-scatter
        # (same finding as _scatter_append_batched: the batched scatter
        # copies the whole cache every step)
        def dus_b(buf, rows):  # rows [B, nkv, D] -> buf [L, B, nkv, T, D]
            for b in range(B):
                buf = jax.lax.dynamic_update_slice(
                    buf, rows[None, b : b + 1, :, None], (idx, b, 0, offsets[b], 0)
                )
            return buf

        def dus_b_scales(buf, rows):  # rows [B, nkv] -> buf [L, B, nkv, T]
            for b in range(B):
                buf = jax.lax.dynamic_update_slice(
                    buf, rows[None, b : b + 1, :, None], (idx, b, 0, offsets[b])
                )
            return buf

        if quantized:
            k_all, v_all, ks_all, vs_all = cc
            kq, ksc = quantize_kv_rows(k[:, :, 0, :])  # [B, nkv, D] -> + [B, nkv]
            vq, vsc = quantize_kv_rows(v[:, :, 0, :])
            k_all = dus_b(k_all, kq)
            v_all = dus_b(v_all, vq)
            ks_all = dus_b_scales(ks_all, ksc)
            vs_all = dus_b_scales(vs_all, vsc)
            k_cache = dequantize_kv(
                jax.lax.dynamic_index_in_dim(k_all, idx, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(ks_all, idx, 0, keepdims=False),
            )
            v_cache = dequantize_kv(
                jax.lax.dynamic_index_in_dim(v_all, idx, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(vs_all, idx, 0, keepdims=False),
            )
            cc = (k_all, v_all, ks_all, vs_all)
        else:
            k_all, v_all = cc
            k_all = dus_b(k_all, k[:, :, 0, :])
            v_all = dus_b(v_all, v[:, :, 0, :])
            k_cache = jax.lax.dynamic_index_in_dim(k_all, idx, 0, keepdims=False)
            v_cache = jax.lax.dynamic_index_in_dim(v_all, idx, 0, keepdims=False)
            cc = (k_all, v_all)
        attn = _attend(q, k_cache, v_cache, mask, scale)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nq * hd)
        h = h + _dense(attn, p["o_proj"])

        x = rms_norm(h, p["post_attention_layernorm"], eps)
        h = h + _dense(_swiglu_mlp(p, x), p["down_proj"])
        return (h, cc), None

    L = cfg.num_hidden_layers
    (h, new_cc), _ = jax.lax.scan(
        layer_fn,
        (inputs_embeds, tuple(cache)),
        (params["layers"], jnp.arange(L, dtype=jnp.int32)),
    )
    h = rms_norm(h, params["norm"], eps)
    return h, type(cache)(*new_cc)


def activation_stats(params: Params, cfg: TalkerConfig, inputs_embeds: jnp.ndarray):
    """Teacher-forced full-causal forward returning per-neuron FFN maxima.

    Replays a generated sequence (prefill + reconstructed decode inputs) and
    returns max |silu(gate(x)) * up(x)| over batch/time as [L, intermediate].
    Feeds the activation profiler (see utils/profiler.py); activations are
    identical to the AR pass because the inputs and causal masking are.
    """
    B, S, _ = inputs_embeds.shape
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    cos, sin = mrope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, cfg.mrope_section, inputs_embeds.dtype
    )
    mask = jnp.broadcast_to(jnp.tril(jnp.ones((S, S), bool))[None], (B, S, S))
    scale = cfg.head_dim**-0.5
    nq, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    eps = cfg.rms_norm_eps

    def layer_fn(h, p):
        x = rms_norm(h, p["input_layernorm"], eps)
        q, k, v = _project_qkv(p, x, B, S, nq, nkv, hd, eps)
        q, k = apply_rotary(q, k, cos, sin)
        attn = _attend(q, k, v, mask, scale)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nq * hd)
        h = h + _dense(attn, p["o_proj"])
        x = rms_norm(h, p["post_attention_layernorm"], eps)
        gated = _swiglu_mlp(p, x)
        act_max = jnp.max(jnp.abs(gated.astype(jnp.float32)), axis=(0, 1))
        h = h + _dense(gated, p["down_proj"])
        return h, act_max

    _, acts = jax.lax.scan(layer_fn, inputs_embeds, params["layers"])
    return acts  # [L, intermediate]


def codec_logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """First-codebook logits [B, S, vocab] in float32 for the sampler."""
    return _dense(hidden.astype(jnp.float32), params["codec_head"])
