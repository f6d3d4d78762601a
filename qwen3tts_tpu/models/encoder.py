"""Speech-tokenizer encoder (Mimi-style) for voice cloning.

TPU-native re-design of the reference encoder
(reference: Sources/Qwen3TTS/Models/SpeechTokenizerEncoder.swift:114-1070):
24 kHz audio -> 16-codebook codes at 12.5 Hz (downsample 1920x).

Pipeline: SEANet conv encoder (init conv 1->64 k7; 4 stages with reversed
ratios [4,5,6,8]: ELU -> ResnetBlock(dilated k3 + 1x1, true skip) -> ELU ->
strided downsample k=2r, channels double; final conv -> 512)
-> 8-layer causal transformer (LayerNorm + bias, plain-GELU MLP 2048,
   LayerScale, standard RoPE theta 10000, full causal mask)
-> ConvDownsample1d (stride 2, edge pad, no bias)
-> Split RVQ encode: Euclidean nearest-codebook argmin over
   ||e||^2/2 - x.e (32 quantizers; first 16 returned).

One-shot encode: the whole thing is a single XLA program; the reference's
per-layer KV caches are unnecessary (it builds a full causal mask anyway,
SpeechTokenizerEncoder.swift:1039-1046).

Codebooks are derived at load time: embedding = embed_sum / clamp(usage, eps)
(reference :709-767).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TokenizerEncoderConfig
from ..ops.conv import streamable_conv1d
from ..ops.norms import elu, gelu_tanh, layer_norm
from ..ops.rope import apply_rotary, rope_cos_sin

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# SEANet
# ---------------------------------------------------------------------------


def seanet_encoder(p: Params, cfg: TokenizerEncoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, 1] audio -> [B, T/960, hidden] latents."""
    h = streamable_conv1d(x, p["init_conv"]["w"], p["init_conv"]["b"], causal=cfg.use_causal_conv)
    for layer, ratio in zip(p["layers"], reversed(cfg.upsampling_ratios)):
        for ridx, res in enumerate(layer["residuals"]):
            r = h
            out = h
            # block = [(k=residual_ksize, dilated), (k=1, dilation 1)];
            # dilation grows per residual layer (reference :357-368)
            res_dilation = cfg.dilation_growth_rate**ridx
            for j, conv_p in enumerate(res["block"]):
                out = elu(out)
                out = streamable_conv1d(
                    out,
                    conv_p["w"],
                    conv_p["b"],
                    dilation=res_dilation if j == 0 else 1,
                    causal=cfg.use_causal_conv,
                )
            h = out + r  # true-skip shortcut
        h = streamable_conv1d(
            elu(h),
            layer["downsample"]["w"],
            layer["downsample"]["b"],
            stride=ratio,
            causal=True,
        )
    h = streamable_conv1d(
        elu(h), p["final_conv"]["w"], p["final_conv"]["b"], causal=cfg.use_causal_conv
    )
    return h


# ---------------------------------------------------------------------------
# Transformer
# ---------------------------------------------------------------------------


def encoder_transformer(p: Params, cfg: TokenizerEncoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Causal transformer at the SEANet rate. x: [B, T, d]."""
    B, T, d = x.shape
    nq = cfg.num_attention_heads
    nkv = cfg.num_key_value_heads
    hd = d // nq  # reference: headDim = dModel / numHeads (EncoderTransformerConfig)
    scale = hd**-0.5
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    cos, sin = rope_cos_sin(pos, hd, cfg.rope_theta, x.dtype)
    causal = jnp.tril(jnp.ones((T, T), bool))

    def layer_fn(h, pl):
        xn = layer_norm(h, pl["norm1"]["w"], pl["norm1"]["b"], 1e-5)
        q = (xn @ pl["q_proj"]).reshape(B, T, nq, hd).transpose(0, 2, 1, 3)
        k = (xn @ pl["k_proj"]).reshape(B, T, nkv, hd).transpose(0, 2, 1, 3)
        v = (xn @ pl["v_proj"]).reshape(B, T, nkv, hd).transpose(0, 2, 1, 3)
        q, k = apply_rotary(q, k, cos, sin)
        scores = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32) * scale
        scores = jnp.where(causal, scores, jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhst,bhtd->bhsd", probs, v).transpose(0, 2, 1, 3).reshape(B, T, d)
        h = h + (attn @ pl["o_proj"]) * pl["layer_scale_1"]
        xn = layer_norm(h, pl["norm2"]["w"], pl["norm2"]["b"], 1e-5)
        mlp = gelu_tanh(xn @ pl["linear1"]) @ pl["linear2"]
        h = h + mlp * pl["layer_scale_2"]
        return h, None

    h, _ = jax.lax.scan(layer_fn, x, p["layers"])
    return h


# ---------------------------------------------------------------------------
# Euclidean RVQ encode
# ---------------------------------------------------------------------------


def codebook_embedding(layer: Params, eps: float = 1e-5) -> jnp.ndarray:
    usage = jnp.maximum(layer["cluster_usage"], eps)[:, None]
    return layer["embedding_sum"] / usage


def _euclidean_encode(x: jnp.ndarray, embedding: jnp.ndarray) -> jnp.ndarray:
    """Nearest codebook entry by ||e||^2/2 - x.e (reference :746-759).

    x: [B, T, d] float32, embedding: [bins, d] -> codes [B, T] int32.
    """
    xf = x.astype(jnp.float32)
    ef = embedding.astype(jnp.float32)
    c2 = 0.5 * jnp.sum(ef * ef, axis=-1)  # [bins]
    dots = jnp.einsum("btd,nd->btn", xf, ef, preferred_element_type=jnp.float32)
    return jnp.argmin(c2[None, None] - dots, axis=-1).astype(jnp.int32)


def _rvq_encode(p: Params, x: jnp.ndarray, nq: int) -> jnp.ndarray:
    """Residual VQ encode. x: [B, T, hidden] -> codes [B, nq, T].

    reference :807-838 (residual-subtract loop) + :841-886 (projections).
    """
    h = x @ p["input_proj"]  # [B, T, dim]
    residual = h.astype(jnp.float32)
    codes = []
    for i in range(nq):
        emb = codebook_embedding(p["layers"][i])
        idx = _euclidean_encode(residual, emb)
        quantized = emb[idx].astype(jnp.float32)
        residual = residual - quantized
        codes.append(idx)
    return jnp.stack(codes, axis=1)


def split_rvq_encode(p: Params, cfg: TokenizerEncoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, hidden] -> codes [B, num_quantizers, T] (semantic first)."""
    first = _rvq_encode(p["rvq_first"], x, 1)
    rest = _rvq_encode(p["rvq_rest"], x, cfg.num_quantizers - 1)
    return jnp.concatenate([first, rest], axis=1)


# ---------------------------------------------------------------------------
# Full encode
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "valid_num_quantizers"))
def encode(
    params: Params,
    cfg: TokenizerEncoderConfig,
    audio: jnp.ndarray,
    valid_num_quantizers: int = 16,
) -> jnp.ndarray:
    """audio [B, samples] @24 kHz -> codes [B, 16, T] at 12.5 Hz
    (reference :1031-1056)."""
    x = audio[..., None].astype(jnp.float32)  # [B, T, 1]
    h = seanet_encoder(params["seanet"], cfg, x)
    h = encoder_transformer(params["transformer"], cfg, h)
    # downsample to the frame rate (stride = encoder_frame_rate / frame_rate)
    ratio_prod = int(np.prod(cfg.upsampling_ratios))
    stride = int((cfg.sampling_rate / ratio_prod) / cfg.frame_rate)
    h = streamable_conv1d(
        h, params["downsample"]["w"], None, stride=stride, causal=cfg.use_causal_conv,
        pad_mode="edge",
    )
    codes = split_rvq_encode(params["quantizer"], cfg, h)
    return codes[:, :valid_num_quantizers]


# ---------------------------------------------------------------------------
# Synthetic init
# ---------------------------------------------------------------------------


def _conv(key, k, c_in, c_out, dtype, bias=True):
    w = jax.random.normal(key, (k, c_in, c_out), jnp.float32) / np.sqrt(c_in * k)
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((c_out,), dtype)
    return p


def init_encoder_params(key, cfg: TokenizerEncoderConfig, dtype=jnp.float32) -> Params:
    ks = list(jax.random.split(key, 128))
    kit = iter(ks)
    nf = cfg.num_filters
    d = cfg.hidden_size

    layers = []
    mult = 1
    for ratio in reversed(cfg.upsampling_ratios):
        dim = mult * nf
        hidden = dim // cfg.compress
        residuals = []
        for _ in range(cfg.num_residual_layers):
            residuals.append(
                {
                    "block": [
                        _conv(next(kit), cfg.residual_kernel_size, dim, hidden, dtype),
                        _conv(next(kit), 1, hidden, dim, dtype),
                    ],
                }
            )
        layers.append(
            {
                "residuals": residuals,
                "downsample": _conv(next(kit), ratio * 2, dim, dim * 2, dtype),
            }
        )
        mult *= 2

    L = cfg.num_hidden_layers
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    hd = d // nq

    def stack(k0, d_in, d_out):
        return (
            jax.random.normal(k0, (L, d_in, d_out), jnp.float32) / np.sqrt(d_in)
        ).astype(dtype)

    transformer = {
        "layers": {
            "q_proj": stack(next(kit), d, d),
            "k_proj": stack(next(kit), d, nkv * hd),
            "v_proj": stack(next(kit), d, nkv * hd),
            "o_proj": stack(next(kit), d, d),
            "norm1": {"w": jnp.ones((L, d), dtype), "b": jnp.zeros((L, d), dtype)},
            "norm2": {"w": jnp.ones((L, d), dtype), "b": jnp.zeros((L, d), dtype)},
            "linear1": stack(next(kit), d, cfg.intermediate_size),
            "linear2": stack(next(kit), cfg.intermediate_size, d),
            "layer_scale_1": jnp.full((L, d), cfg.layer_scale_initial_scale, dtype),
            "layer_scale_2": jnp.full((L, d), cfg.layer_scale_initial_scale, dtype),
        }
    }

    def rvq(k0, nq_):
        kk = jax.random.split(k0, nq_ + 2)
        return {
            "input_proj": (
                jax.random.normal(kk[0], (d, cfg.codebook_dim), jnp.float32) / np.sqrt(d)
            ).astype(dtype),
            "output_proj": (
                jax.random.normal(kk[1], (cfg.codebook_dim, d), jnp.float32)
                / np.sqrt(cfg.codebook_dim)
            ).astype(dtype),
            "layers": [
                {
                    "embedding_sum": jax.random.normal(
                        kk[2 + i], (cfg.codebook_size, cfg.codebook_dim), jnp.float32
                    ),
                    "cluster_usage": jnp.ones((cfg.codebook_size,), jnp.float32),
                }
                for i in range(nq_)
            ],
        }

    final_dim = mult * nf
    ratio_prod = int(np.prod(cfg.upsampling_ratios))
    stride = int((cfg.sampling_rate / ratio_prod) / cfg.frame_rate)
    return {
        "seanet": {
            "init_conv": _conv(next(kit), cfg.kernel_size, cfg.audio_channels, nf, dtype),
            "layers": layers,
            "final_conv": _conv(next(kit), cfg.last_kernel_size, final_dim, d, dtype),
        },
        "transformer": transformer,
        "downsample": {"w": _conv(next(kit), 2 * stride, d, d, dtype, bias=False)["w"]},
        "quantizer": {
            "rvq_first": rvq(next(kit), 1),
            "rvq_rest": rvq(next(kit), cfg.num_quantizers - 1),
        },
    }
