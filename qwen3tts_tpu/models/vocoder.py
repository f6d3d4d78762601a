"""Speech-tokenizer decoder (code2wav vocoder).

TPU-native re-design of the reference decoder
(reference: Sources/Qwen3TTS/Models/SpeechTokenizer.swift:175-785):
16-codebook codes at 12.5 Hz -> 24 kHz waveform, total upsample 1920x.

Pipeline (identical math, NWC layout, compiled as ONE XLA program):
  SplitRVQ dequantize (1 semantic cb size-4096 + 15 acoustic cb size-2048,
  inner dim 256, 1x1 output projections to 512)
  -> pre_conv (512 -> 1024, k=3 causal)
  -> 8-layer pre-transformer (hidden 512, in/out proj 1024<->512,
     LayerScale 0.01, RMSNorm, SwiGLU; full bidirectional attention,
     no positional encoding — the reference passes mask nil,
     SpeechTokenizer.swift:762-764)
  -> 2x [CausalConvTranspose(k=2,s=2) + ConvNeXt] upsample stages
  -> MainDecoder: initConv(1024->1536,k7) + 4 DecoderBlocks
     (SnakeBeta -> causal ConvTranspose k=2r s=r -> 3 dilated residual units
      d=1,3,9; rates [8,5,4,3]; channels halve 1536->96)
  -> outSnake -> outConv(96->1, k7) -> clip [-1, 1]
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TokenizerDecoderConfig
from ..ops.conv import causal_conv1d, causal_conv1d_transpose
from ..ops.norms import layer_norm, rms_norm, silu, snake_beta

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Synthetic init (tests / benchmarks)
# ---------------------------------------------------------------------------


def _conv_w(key, k, c_in, c_out, dtype, groups=1):
    scale = 1.0 / np.sqrt(c_in * k / groups)
    return {
        "w": (jax.random.normal(key, (k, c_in // groups, c_out), jnp.float32) * scale).astype(dtype),
        "b": jnp.zeros((c_out,), dtype),
    }


def _convt_w(key, k, c_in, c_out, dtype):
    scale = 1.0 / np.sqrt(c_in * k)
    return {
        "w": (jax.random.normal(key, (k, c_out, c_in), jnp.float32) * scale).astype(dtype),
        "b": jnp.zeros((c_out,), dtype),
    }


def _lin(key, d_in, d_out, dtype, bias=True):
    p = {"w": (jax.random.normal(key, (d_in, d_out), jnp.float32) / np.sqrt(d_in)).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_vocoder_params(key, cfg: TokenizerDecoderConfig, dtype=jnp.float32) -> Params:
    ks = list(jax.random.split(key, 64))
    kit = iter(ks)
    cb, inner = cfg.codebook_dim, cfg.vector_quantization_hidden_dimension // 2
    inner = cfg.codebook_dim // 2  # 256: inner VQ dimension (dimension/2)
    n_ac = cfg.num_quantizers - cfg.num_semantic_quantizers

    params: Params = {
        "quantizer": {
            "rvq_first": {
                "codebooks": (
                    jax.random.normal(
                        next(kit), (cfg.num_semantic_quantizers, cfg.semantic_codebook_size, inner), jnp.float32
                    )
                    * 8.0
                ).astype(dtype),
                "output_proj": _lin(next(kit), inner, cb, dtype, bias=False),
            },
            "rvq_rest": {
                "codebooks": (
                    jax.random.normal(next(kit), (n_ac, cfg.codebook_size, inner), jnp.float32) * 2.0
                ).astype(dtype),
                "output_proj": _lin(next(kit), inner, cb, dtype, bias=False),
            },
        },
        "pre_conv": _conv_w(next(kit), 3, cb, cfg.latent_dim, dtype),
        "pre_transformer": _init_pre_transformer(next(kit), cfg, dtype),
        "upsample": [
            {
                "conv": _convt_w(next(kit), r, cfg.latent_dim, cfg.latent_dim, dtype),
                "convnext": {
                    "dwconv": _conv_w(next(kit), 7, cfg.latent_dim, cfg.latent_dim, dtype, groups=cfg.latent_dim),
                    "norm": {"w": jnp.ones((cfg.latent_dim,), dtype), "b": jnp.zeros((cfg.latent_dim,), dtype)},
                    "pwconv1": _lin(next(kit), cfg.latent_dim, cfg.latent_dim * 4, dtype),
                    "pwconv2": _lin(next(kit), cfg.latent_dim * 4, cfg.latent_dim, dtype),
                    "gamma": jnp.full((cfg.latent_dim,), 1e-6, dtype),
                },
            }
            for r in cfg.upsampling_ratios
        ],
        "decoder": _init_main_decoder(next(kit), cfg, dtype),
    }
    return params


def _init_pre_transformer(key, cfg: TokenizerDecoderConfig, dtype) -> Params:
    ks = jax.random.split(key, 12)
    L, h = cfg.num_hidden_layers, cfg.hidden_size
    hd, nq, nkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads

    def stack(k0, d_in, d_out):
        return jax.vmap(lambda k: _lin(k, d_in, d_out, dtype, bias=False)["w"])(
            jax.random.split(k0, L)
        )

    return {
        "input_proj": _lin(ks[0], cfg.latent_dim, h, dtype),
        "output_proj": _lin(ks[1], h, cfg.latent_dim, dtype),
        "layers": {
            "q_proj": stack(ks[2], h, nq * hd),
            "k_proj": stack(ks[3], h, nkv * hd),
            "v_proj": stack(ks[4], h, nkv * hd),
            "o_proj": stack(ks[5], nq * hd, h),
            "gate_proj": stack(ks[6], h, cfg.intermediate_size),
            "up_proj": stack(ks[7], h, cfg.intermediate_size),
            "down_proj": stack(ks[8], cfg.intermediate_size, h),
            "input_layernorm": jnp.ones((L, h), dtype),
            "post_attention_layernorm": jnp.ones((L, h), dtype),
            "self_attn_layer_scale": jnp.full((L, h), cfg.layer_scale_initial_scale, dtype),
            "mlp_layer_scale": jnp.full((L, h), cfg.layer_scale_initial_scale, dtype),
        },
        "norm": jnp.ones((h,), dtype),
    }


def _init_main_decoder(key, cfg: TokenizerDecoderConfig, dtype) -> Params:
    ks = list(jax.random.split(key, 40))
    kit = iter(ks)
    dd = cfg.decoder_dim
    blocks = []
    for i, rate in enumerate(cfg.upsample_rates):
        c_in, c_out = dd // (1 << i), dd // (1 << (i + 1))
        blocks.append(
            {
                "snake": {"alpha": jnp.zeros((c_in,), dtype), "beta": jnp.zeros((c_in,), dtype)},
                "upsample": _convt_w(next(kit), rate * 2, c_in, c_out, dtype),
                **{
                    f"res{j + 1}": {
                        "act1": {"alpha": jnp.zeros((c_out,), dtype), "beta": jnp.zeros((c_out,), dtype)},
                        "conv1": _conv_w(next(kit), 7, c_out, c_out, dtype),
                        "act2": {"alpha": jnp.zeros((c_out,), dtype), "beta": jnp.zeros((c_out,), dtype)},
                        "conv2": _conv_w(next(kit), 1, c_out, c_out, dtype),
                    }
                    for j, _d in enumerate((1, 3, 9))
                },
            }
        )
    out_dim = dd // (1 << len(cfg.upsample_rates))
    return {
        "init_conv": _conv_w(next(kit), 7, cfg.latent_dim, dd, dtype),
        "blocks": blocks,
        "out_snake": {"alpha": jnp.zeros((out_dim,), dtype), "beta": jnp.zeros((out_dim,), dtype)},
        "out_conv": _conv_w(next(kit), 7, out_dim, 1, dtype),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _mm(x, w):
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def rvq_decode(params: Params, cfg: TokenizerDecoderConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """SplitRVQ dequantize. codes: [B, T, 16] int32 -> [B, T, codebook_dim].

    reference SpeechTokenizer.swift:61-227 (semantic cb 0 + 15 acoustic cbs,
    each RVQ sums its codebooks then applies a 1x1 output projection).
    """
    nsem = cfg.num_semantic_quantizers
    first = params["quantizer"]["rvq_first"]
    rest = params["quantizer"]["rvq_rest"]

    sem = jnp.zeros(codes.shape[:2] + (first["codebooks"].shape[-1],), first["codebooks"].dtype)
    for i in range(nsem):
        sem = sem + first["codebooks"][i][codes[..., i]]
    out = _mm(sem, first["output_proj"]["w"])

    ac = jnp.zeros_like(sem)
    n_ac = rest["codebooks"].shape[0]
    take = min(n_ac, codes.shape[-1] - nsem)
    for i in range(take):
        ac = ac + rest["codebooks"][i][codes[..., nsem + i]]
    if take > 0:
        out = out + _mm(ac, rest["output_proj"]["w"])
    return out


def pre_transformer(
    params: Params,
    cfg: TokenizerDecoderConfig,
    x: jnp.ndarray,
    frames: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """8-layer bidirectional transformer at the latent rate. x: [B, T, latent].

    The reference runs it unmasked (SpeechTokenizer.swift:762-764). Because
    it is *bidirectional*, right-padding the codes to a compile bucket would
    leak pad frames into real audio — so when ``frames`` (valid frame count)
    is given, attention is masked to the first ``frames`` keys, making
    bucketed decode prefix-exact (everything downstream is causal convs).
    """
    h = _mm(x, params["input_proj"]["w"]) + params["input_proj"]["b"]
    B, T, _ = h.shape
    nq, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    scale = hd**-0.5
    eps = cfg.rms_norm_eps
    key_mask = None
    if frames is not None:
        frames_b = jnp.broadcast_to(jnp.asarray(frames, jnp.int32).reshape(-1), (B,))
        key_mask = (
            jnp.arange(T, dtype=jnp.int32)[None] < frames_b[:, None]
        )[:, None, None, :]  # [B, 1, 1, T] — per-sequence valid-frame mask

    def layer_fn(h, p):
        x = rms_norm(h, p["input_layernorm"], eps)
        q = _mm(x, p["q_proj"]).reshape(B, T, nq, hd).transpose(0, 2, 1, 3)
        k = _mm(x, p["k_proj"]).reshape(B, T, nkv, hd).transpose(0, 2, 1, 3)
        v = _mm(x, p["v_proj"]).reshape(B, T, nkv, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32) * scale
        if key_mask is not None:
            scores = jnp.where(key_mask, scores, jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhst,bhtd->bhsd", probs, v).transpose(0, 2, 1, 3).reshape(B, T, nq * hd)
        h = h + _mm(attn, p["o_proj"]) * p["self_attn_layer_scale"]
        x = rms_norm(h, p["post_attention_layernorm"], eps)
        gated = silu(_mm(x, p["gate_proj"])) * _mm(x, p["up_proj"])
        h = h + _mm(gated, p["down_proj"]) * p["mlp_layer_scale"]
        return h, None

    h, _ = jax.lax.scan(layer_fn, h, params["layers"])
    h = rms_norm(h, params["norm"], eps)
    return _mm(h, params["output_proj"]["w"]) + params["output_proj"]["b"]


def convnext_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """ConvNeXt block (reference SpeechTokenizer.swift:359-402). x: [B,T,C]."""
    dim = x.shape[-1]
    h = causal_conv1d(x, p["dwconv"]["w"], p["dwconv"]["b"], groups=dim)
    h = layer_norm(h, p["norm"]["w"], p["norm"]["b"], 1e-6)
    h = _mm(h, p["pwconv1"]["w"]) + p["pwconv1"]["b"]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
    h = _mm(h, p["pwconv2"]["w"]) + p["pwconv2"]["b"]
    return x + p["gamma"] * h


def _residual_unit(p: Params, x: jnp.ndarray, dilation: int) -> jnp.ndarray:
    h = snake_beta(x, p["act1"]["alpha"], p["act1"]["beta"])
    h = causal_conv1d(h, p["conv1"]["w"], p["conv1"]["b"], dilation=dilation)
    h = snake_beta(h, p["act2"]["alpha"], p["act2"]["beta"])
    h = causal_conv1d(h, p["conv2"]["w"], p["conv2"]["b"])
    return x + h


def main_decoder(params: Params, cfg: TokenizerDecoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """480x upsampling stack. x: [B, T, latent] -> [B, T*480, 1]."""
    h = causal_conv1d(x, params["init_conv"]["w"], params["init_conv"]["b"])
    for block, rate in zip(params["blocks"], cfg.upsample_rates):
        h = snake_beta(h, block["snake"]["alpha"], block["snake"]["beta"])
        h = causal_conv1d_transpose(h, block["upsample"]["w"], block["upsample"]["b"], stride=rate)
        for name, d in (("res1", 1), ("res2", 3), ("res3", 9)):
            h = _residual_unit(block[name], h, d)
    h = snake_beta(h, params["out_snake"]["alpha"], params["out_snake"]["beta"])
    return causal_conv1d(h, params["out_conv"]["w"], params["out_conv"]["b"])


def decode_latents(
    params: Params,
    cfg: TokenizerDecoderConfig,
    codes: jnp.ndarray,
    frames: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """codes [B, T, 16] -> waveform [B, T*1920] (whole pipeline, one program)."""
    h = rvq_decode(params, cfg, codes)  # [B, T, 512]
    h = causal_conv1d(h, params["pre_conv"]["w"], params["pre_conv"]["b"])  # [B, T, 1024]
    h = pre_transformer(params["pre_transformer"], cfg, h, frames)
    for stage, ratio in zip(params["upsample"], cfg.upsampling_ratios):
        h = causal_conv1d_transpose(h, stage["conv"]["w"], stage["conv"]["b"], stride=ratio)
        h = convnext_block(stage["convnext"], h)
    wav = main_decoder(params["decoder"], cfg, h)  # [B, T*1920, 1]
    return jnp.clip(wav[..., 0], -1.0, 1.0)


def decode_stages(
    params: Params, cfg: TokenizerDecoderConfig, codes: jnp.ndarray
) -> dict[str, jnp.ndarray]:
    """Per-stage intermediates for golden-value diffing.

    Mirrors the reference's stage-by-stage walk
    (Tests/Qwen3TTSTests/Qwen3TTSTests.swift:25-282: quantizer -> pre_conv ->
    pre_transformer -> each upsample stage -> main decoder -> full decode).
    Used by tools/parity_harness.py; not a production path.
    """
    out: dict[str, jnp.ndarray] = {}
    h = out["quantizer"] = rvq_decode(params, cfg, codes)
    h = out["pre_conv"] = causal_conv1d(h, params["pre_conv"]["w"], params["pre_conv"]["b"])
    h = out["pre_transformer"] = pre_transformer(params["pre_transformer"], cfg, h)
    for i, (stage, ratio) in enumerate(zip(params["upsample"], cfg.upsampling_ratios)):
        h = causal_conv1d_transpose(h, stage["conv"]["w"], stage["conv"]["b"], stride=ratio)
        h = out[f"upsample{i}"] = convnext_block(stage["convnext"], h)
    wav = main_decoder(params["decoder"], cfg, h)
    out["decoder"] = wav
    out["audio"] = jnp.clip(wav[..., 0], -1.0, 1.0)
    return out


import functools


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode(
    params: Params,
    cfg: TokenizerDecoderConfig,
    codes: jnp.ndarray,
    frames: jnp.ndarray | None = None,
):
    """Public decode: codes [B, T, 16] -> (audio [B, T*1920], lengths [B]).

    ``frames`` (optional scalar) marks the number of valid frames when the
    codes buffer is right-padded to a compile bucket; output beyond
    ``frames*1920`` samples is garbage and must be trimmed by the caller.

    Valid length = (#frames with first-codebook code > 0) * 1920
    (reference SpeechTokenizer.swift:823-836).
    """
    wav = decode_latents(params, cfg, codes, frames)
    frame_idx = jnp.arange(codes.shape[1], dtype=jnp.int32)
    if frames is None:
        in_range = frame_idx[None] < jnp.int32(codes.shape[1])
    else:
        frames_b = jnp.asarray(frames, jnp.int32).reshape(-1)
        in_range = frame_idx[None] < frames_b[:, None]
    valid = jnp.sum(((codes[..., 0] > 0) & in_range).astype(jnp.int32), axis=1)
    return wav, valid * cfg.total_upsample
