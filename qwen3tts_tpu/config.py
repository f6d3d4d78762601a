"""Configuration system for the TPU-native Qwen3-TTS framework.

Parses HuggingFace ``config.json`` trees into frozen dataclasses, with the
same field names, defaults, and nesting as the reference implementation's
Codable structs (reference: Sources/Qwen3TTS/Models/Config.swift:17-668).

Every config is a plain frozen dataclass so it can be hashed and used as a
static argument to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping


def _get(d: Mapping[str, Any], key: str, default):
    v = d.get(key, default)
    return default if v is None else v


# ---------------------------------------------------------------------------
# Speaker encoder (ECAPA-TDNN) config — reference Config.swift:57-114
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SpeakerEncoderConfig:
    mel_dim: int = 128
    enc_dim: int = 1024
    enc_channels: tuple[int, ...] = (512, 512, 512, 512, 1536)
    enc_kernel_sizes: tuple[int, ...] = (5, 3, 3, 3, 1)
    enc_dilations: tuple[int, ...] = (1, 2, 3, 4, 1)
    enc_attention_channels: int = 128
    enc_res2net_scale: int = 8
    enc_se_channels: int = 128
    sample_rate: int = 24000

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "SpeakerEncoderConfig":
        return SpeakerEncoderConfig(
            mel_dim=_get(d, "mel_dim", 128),
            enc_dim=_get(d, "enc_dim", 1024),
            enc_channels=tuple(_get(d, "enc_channels", [512, 512, 512, 512, 1536])),
            enc_kernel_sizes=tuple(_get(d, "enc_kernel_sizes", [5, 3, 3, 3, 1])),
            enc_dilations=tuple(_get(d, "enc_dilations", [1, 2, 3, 4, 1])),
            enc_attention_channels=_get(d, "enc_attention_channels", 128),
            enc_res2net_scale=_get(d, "enc_res2net_scale", 8),
            enc_se_channels=_get(d, "enc_se_channels", 128),
            sample_rate=_get(d, "sample_rate", 24000),
        )


# ---------------------------------------------------------------------------
# Code predictor config — reference Config.swift:118-186
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CodePredictorConfig:
    vocab_size: int = 2048
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 5
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    num_code_groups: int = 16
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    max_position_embeddings: int = 65536

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "CodePredictorConfig":
        return CodePredictorConfig(
            vocab_size=_get(d, "vocab_size", 2048),
            hidden_size=_get(d, "hidden_size", 1024),
            intermediate_size=_get(d, "intermediate_size", 3072),
            num_hidden_layers=_get(d, "num_hidden_layers", 5),
            num_attention_heads=_get(d, "num_attention_heads", 16),
            num_key_value_heads=_get(d, "num_key_value_heads", 8),
            head_dim=_get(d, "head_dim", 128),
            num_code_groups=_get(d, "num_code_groups", 16),
            rms_norm_eps=_get(d, "rms_norm_eps", 1e-6),
            rope_theta=_get(d, "rope_theta", 1_000_000.0),
            max_position_embeddings=_get(d, "max_position_embeddings", 65536),
        )


# ---------------------------------------------------------------------------
# RoPE scaling (MRoPE) config — reference Config.swift:190-213
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RopeScalingConfig:
    interleaved: bool = True
    mrope_section: tuple[int, ...] = (24, 20, 20)
    rope_type: str = "default"

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "RopeScalingConfig":
        return RopeScalingConfig(
            interleaved=_get(d, "interleaved", True),
            mrope_section=tuple(_get(d, "mrope_section", [24, 20, 20])),
            rope_type=_get(d, "rope_type", "default"),
        )


# ---------------------------------------------------------------------------
# Talker config — reference Config.swift:217-334
# ---------------------------------------------------------------------------

_DEFAULT_LANGUAGE_IDS: tuple[tuple[str, int], ...] = (
    ("chinese", 2055),
    ("english", 2050),
    ("german", 2053),
    ("italian", 2070),
    ("portuguese", 2071),
    ("spanish", 2054),
    ("japanese", 2058),
    ("korean", 2064),
    ("french", 2061),
    ("russian", 2069),
)


@dataclass(frozen=True)
class TalkerConfig:
    vocab_size: int = 3072  # codec vocabulary
    text_vocab_size: int = 151936
    hidden_size: int = 2048
    text_hidden_size: int = 2048
    intermediate_size: int = 6144
    per_layer_intermediate_sizes: tuple[int, ...] | None = None
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    num_code_groups: int = 16
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    rope_scaling: RopeScalingConfig | None = None
    max_position_embeddings: int = 32768
    # Codec special token ids (reference Config.swift:309-315)
    codec_eos_token_id: int = 2150
    codec_think_id: int = 2154
    codec_nothink_id: int = 2155
    codec_think_bos_id: int = 2156
    codec_think_eos_id: int = 2157
    codec_pad_id: int = 2148
    codec_bos_id: int = 2149
    codec_language_id: tuple[tuple[str, int], ...] = _DEFAULT_LANGUAGE_IDS
    # speaker name -> codec token id (CustomVoice/Base models)
    spk_id: tuple[tuple[str, int], ...] | None = None
    # speaker name -> dialect name (JSON value false => not a dialect)
    spk_is_dialect: tuple[tuple[str, str], ...] | None = None
    code_predictor_config: CodePredictorConfig | None = None

    @property
    def language_ids(self) -> dict[str, int]:
        return dict(self.codec_language_id)

    @property
    def speaker_ids(self) -> dict[str, int]:
        return dict(self.spk_id) if self.spk_id else {}

    @property
    def speaker_dialects(self) -> dict[str, str]:
        return dict(self.spk_is_dialect) if self.spk_is_dialect else {}

    @property
    def mrope_section(self) -> tuple[int, ...]:
        if self.rope_scaling is not None:
            return self.rope_scaling.mrope_section
        return (24, 20, 20)

    def layer_intermediate_size(self, layer: int) -> int:
        if self.per_layer_intermediate_sizes is not None:
            return self.per_layer_intermediate_sizes[layer]
        return self.intermediate_size

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "TalkerConfig":
        rope_scaling = d.get("rope_scaling")
        per_layer = d.get("per_layer_intermediate_sizes")
        spk_id = d.get("spk_id")
        spk_is_dialect = d.get("spk_is_dialect")
        dialects = None
        if spk_is_dialect:
            # JSON union: false (not a dialect) or dialect-name string
            dialects = tuple(
                (k.lower(), v) for k, v in spk_is_dialect.items() if isinstance(v, str)
            )
        cp = d.get("code_predictor_config")
        return TalkerConfig(
            vocab_size=_get(d, "vocab_size", 3072),
            text_vocab_size=_get(d, "text_vocab_size", 151936),
            hidden_size=_get(d, "hidden_size", 2048),
            text_hidden_size=_get(d, "text_hidden_size", 2048),
            intermediate_size=_get(d, "intermediate_size", 6144),
            per_layer_intermediate_sizes=tuple(per_layer) if per_layer else None,
            num_hidden_layers=_get(d, "num_hidden_layers", 28),
            num_attention_heads=_get(d, "num_attention_heads", 16),
            num_key_value_heads=_get(d, "num_key_value_heads", 8),
            head_dim=_get(d, "head_dim", 128),
            num_code_groups=_get(d, "num_code_groups", 16),
            rms_norm_eps=_get(d, "rms_norm_eps", 1e-6),
            rope_theta=_get(d, "rope_theta", 1_000_000.0),
            rope_scaling=RopeScalingConfig.from_dict(rope_scaling) if rope_scaling else None,
            max_position_embeddings=_get(d, "max_position_embeddings", 32768),
            codec_eos_token_id=_get(d, "codec_eos_token_id", 2150),
            codec_think_id=_get(d, "codec_think_id", 2154),
            codec_nothink_id=_get(d, "codec_nothink_id", 2155),
            codec_think_bos_id=_get(d, "codec_think_bos_id", 2156),
            codec_think_eos_id=_get(d, "codec_think_eos_id", 2157),
            codec_pad_id=_get(d, "codec_pad_id", 2148),
            codec_bos_id=_get(d, "codec_bos_id", 2149),
            codec_language_id=tuple(
                sorted(_get(d, "codec_language_id", dict(_DEFAULT_LANGUAGE_IDS)).items())
            ),
            spk_id=tuple(sorted((k.lower(), v) for k, v in spk_id.items())) if spk_id else None,
            spk_is_dialect=dialects,
            code_predictor_config=CodePredictorConfig.from_dict(cp) if cp else None,
        )


# ---------------------------------------------------------------------------
# Speech tokenizer decoder (vocoder) config — reference Config.swift:338-415
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TokenizerDecoderConfig:
    latent_dim: int = 1024
    codebook_dim: int = 512
    codebook_size: int = 2048
    decoder_dim: int = 1536
    hidden_size: int = 512
    intermediate_size: int = 1024
    num_hidden_layers: int = 8
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 64
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 8000
    sliding_window: int = 72
    num_quantizers: int = 16
    num_semantic_quantizers: int = 1
    semantic_codebook_size: int = 4096
    upsample_rates: tuple[int, ...] = (8, 5, 4, 3)
    upsampling_ratios: tuple[int, ...] = (2, 2)
    vector_quantization_hidden_dimension: int = 512
    layer_scale_initial_scale: float = 0.01

    @property
    def total_upsample(self) -> int:
        """8*5*4*3 * 2*2 = 1920 (reference Config.swift:412-414)."""
        t = 1
        for r in self.upsample_rates:
            t *= r
        for r in self.upsampling_ratios:
            t *= r
        return t

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "TokenizerDecoderConfig":
        return TokenizerDecoderConfig(
            latent_dim=_get(d, "latent_dim", 1024),
            codebook_dim=_get(d, "codebook_dim", 512),
            codebook_size=_get(d, "codebook_size", 2048),
            decoder_dim=_get(d, "decoder_dim", 1536),
            hidden_size=_get(d, "hidden_size", 512),
            intermediate_size=_get(d, "intermediate_size", 1024),
            num_hidden_layers=_get(d, "num_hidden_layers", 8),
            num_attention_heads=_get(d, "num_attention_heads", 16),
            num_key_value_heads=_get(d, "num_key_value_heads", 16),
            head_dim=_get(d, "head_dim", 64),
            rms_norm_eps=_get(d, "rms_norm_eps", 1e-5),
            rope_theta=_get(d, "rope_theta", 10000.0),
            max_position_embeddings=_get(d, "max_position_embeddings", 8000),
            sliding_window=_get(d, "sliding_window", 72),
            num_quantizers=_get(d, "num_quantizers", 16),
            num_semantic_quantizers=_get(d, "num_semantic_quantizers", 1),
            semantic_codebook_size=_get(d, "semantic_codebook_size", 4096),
            upsample_rates=tuple(_get(d, "upsample_rates", [8, 5, 4, 3])),
            upsampling_ratios=tuple(_get(d, "upsampling_ratios", [2, 2])),
            vector_quantization_hidden_dimension=_get(
                d, "vector_quantization_hidden_dimension", 512
            ),
            layer_scale_initial_scale=_get(d, "layer_scale_initial_scale", 0.01),
        )


# ---------------------------------------------------------------------------
# Speech tokenizer encoder config — reference Config.swift:419-561
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TokenizerEncoderConfig:
    frame_rate: float = 12.5
    audio_channels: int = 1
    codebook_dim: int = 256
    codebook_size: int = 2048
    compress: int = 2
    dilation_growth_rate: int = 2
    head_dim: int = 64
    hidden_size: int = 512
    intermediate_size: int = 2048
    kernel_size: int = 7
    last_kernel_size: int = 3
    layer_scale_initial_scale: float = 0.01
    max_position_embeddings: int = 8000
    num_attention_heads: int = 8
    num_filters: int = 64
    num_hidden_layers: int = 8
    num_key_value_heads: int = 8
    num_quantizers: int = 32
    num_residual_layers: int = 1
    residual_kernel_size: int = 3
    rope_theta: float = 10000.0
    sampling_rate: int = 24000
    sliding_window: int = 250
    upsampling_ratios: tuple[int, ...] = (8, 6, 5, 4)
    use_causal_conv: bool = True
    use_conv_shortcut: bool = False

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "TokenizerEncoderConfig":
        kwargs = {}
        for f in dataclasses.fields(TokenizerEncoderConfig):
            default = f.default
            v = _get(d, f.name, default)
            if isinstance(default, tuple):
                v = tuple(v)
            kwargs[f.name] = v
        return TokenizerEncoderConfig(**kwargs)


# ---------------------------------------------------------------------------
# Speech tokenizer container — reference Config.swift:565-595
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TokenizerConfig:
    encoder_valid_num_quantizers: int = 16
    input_sample_rate: int = 24000
    output_sample_rate: int = 24000
    decode_upsample_rate: int = 1920
    encode_downsample_rate: int = 1920
    decoder_config: TokenizerDecoderConfig | None = None
    encoder_config: TokenizerEncoderConfig | None = None

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "TokenizerConfig":
        dec = d.get("decoder_config")
        enc = d.get("encoder_config")
        return TokenizerConfig(
            encoder_valid_num_quantizers=_get(d, "encoder_valid_num_quantizers", 16),
            input_sample_rate=_get(d, "input_sample_rate", 24000),
            output_sample_rate=_get(d, "output_sample_rate", 24000),
            decode_upsample_rate=_get(d, "decode_upsample_rate", 1920),
            encode_downsample_rate=_get(d, "encode_downsample_rate", 1920),
            decoder_config=TokenizerDecoderConfig.from_dict(dec) if dec else None,
            encoder_config=TokenizerEncoderConfig.from_dict(enc) if enc else None,
        )


# ---------------------------------------------------------------------------
# Quantization (int4/int8 affine group quantization) — reference reads this
# via MLXLMCommon.BaseConfiguration (Config.swift:617-618, 654-656)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class QuantizationConfig:
    group_size: int = 64
    bits: int = 4
    mode: str = "affine"

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "QuantizationConfig":
        return QuantizationConfig(
            group_size=_get(d, "group_size", 64),
            bits=_get(d, "bits", 4),
            mode=_get(d, "mode", "affine"),
        )


# ---------------------------------------------------------------------------
# Top-level model config — reference Config.swift:599-668
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelConfig:
    model_type: str = "qwen3_tts"
    talker_config: TalkerConfig | None = None
    speaker_encoder_config: SpeakerEncoderConfig | None = None
    tokenizer_type: str = "qwen3_tts_tokenizer_12hz"
    tts_model_size: str = "1b7"  # "0b6" or "1b7"
    tts_model_type: str = "voice_design"  # "base" | "custom_voice" | "voice_design"
    im_start_token_id: int = 151644
    im_end_token_id: int = 151645
    tts_pad_token_id: int = 151671
    tts_bos_token_id: int = 151672
    tts_eos_token_id: int = 151673
    sample_rate: int = 24000
    quantization: QuantizationConfig | None = None

    @property
    def codec_eos_token_id(self) -> int:
        return self.talker_config.codec_eos_token_id if self.talker_config else 2150

    @property
    def mrope_section(self) -> tuple[int, ...]:
        return self.talker_config.mrope_section if self.talker_config else (24, 20, 20)

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "ModelConfig":
        talker = d.get("talker_config")
        spk = d.get("speaker_encoder_config")
        quant = d.get("quantization")
        return ModelConfig(
            model_type=_get(d, "model_type", "qwen3_tts"),
            talker_config=TalkerConfig.from_dict(talker) if talker else None,
            speaker_encoder_config=SpeakerEncoderConfig.from_dict(spk) if spk else None,
            tokenizer_type=_get(d, "tokenizer_type", "qwen3_tts_tokenizer_12hz"),
            tts_model_size=_get(d, "tts_model_size", "1b7"),
            tts_model_type=_get(d, "tts_model_type", "voice_design"),
            im_start_token_id=_get(d, "im_start_token_id", 151644),
            im_end_token_id=_get(d, "im_end_token_id", 151645),
            tts_pad_token_id=_get(d, "tts_pad_token_id", 151671),
            tts_bos_token_id=_get(d, "tts_bos_token_id", 151672),
            tts_eos_token_id=_get(d, "tts_eos_token_id", 151673),
            sample_rate=_get(d, "sample_rate", 24000),
            quantization=QuantizationConfig.from_dict(quant) if quant else None,
        )

    @staticmethod
    def from_json(path: str) -> "ModelConfig":
        with open(path) as f:
            return ModelConfig.from_dict(json.load(f))


def load_tokenizer_config(path: str) -> TokenizerConfig:
    with open(path) as f:
        return TokenizerConfig.from_dict(json.load(f))
