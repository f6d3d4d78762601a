"""Public Qwen3-TTS API: the TPU-native equivalent of the reference's
``Qwen3TTSModel`` (reference: Sources/Qwen3TTS/Models/Qwen3.swift:30-1373).

Surface parity:
  Qwen3TTSModel.from_pretrained(path)          (fromPretrained)
  .generate(text, speaker=, instruct=, ...)    (generate - routes by model type)
  .generate_voice_design / .generate_custom_voice
  .generate_voice_clone(text, reference_audio, reference_text, ...)
  .generate_stream(...)                        (generateStream - yields
                                                TokenEvent*, InfoEvent, AudioEvent)

Design departures (TPU-first, see SURVEY.md §7): prompt construction happens
host-side once per call, everything else (prefill, AR loop, code predictor,
sampling, vocoder) runs as a handful of jit-compiled programs with static
bucketed shapes; the host never syncs inside the decode loop.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig, TalkerConfig
from .models import code_predictor as cp_mod
from .models import encoder as enc_mod
from .models import generate as gen_mod
from .models import speaker_encoder as spk_mod
from .models import talker as tk_mod
from .models import vocoder as vc_mod
from .models.generate import SamplingConfig, pad_to_bucket

CHAT_ASSISTANT = "<|im_start|>assistant\n{}<|im_end|>\n<|im_start|>assistant\n"
CHAT_ASSISTANT_CLOSED = "<|im_start|>assistant\n{}<|im_end|>\n"
CHAT_USER = "<|im_start|>user\n{}<|im_end|>\n"

# Frame-count buckets for max_frames caps AND the fused vocoder's
# lax.switch ladder. 72/96 added in round 4: the headline short-utterance
# shape (66 frames under a 128 cap) paid a 128-frame vocoder decode — ~48%
# padding waste on the ~36 ms in-program vocoder stage; the 72 bucket cuts
# that to 9% with zero numerics change (valid-frames masking makes bucketed
# decode prefix-exact — tests/test_generate.py::TestFusedAudioBuckets).
# Override (experiments): QWEN3TTS_GEN_BUCKETS="128,256,..."
GEN_BUCKETS = tuple(
    int(b)
    for b in os.environ.get(
        "QWEN3TTS_GEN_BUCKETS", "72,96,128,256,512,1024,2048"
    ).split(",")
)


class Qwen3TTSError(Exception):
    """Generation errors (reference Core/GenerationTypes.swift:63-84)."""


@dataclass
class GenerationInfo:
    """reference AudioGenerationInfo (Core/GenerationTypes.swift:15-46)."""

    prompt_token_count: int
    generation_token_count: int
    prefill_time: float
    generate_time: float
    tokens_per_second: float
    peak_memory_usage: float  # GB

    @property
    def summary(self) -> str:
        return (
            f"Prompt:     {self.prompt_token_count} tokens, {self.prefill_time:.3f}s\n"
            f"Generation: {self.generation_token_count} tokens, "
            f"{self.tokens_per_second:.2f} tokens/s, {self.generate_time:.3f}s\n"
            f"Peak Memory Usage: {self.peak_memory_usage:.3f} GB"
        )


@dataclass
class TokenEvent:
    token: int


@dataclass
class InfoEvent:
    info: GenerationInfo


@dataclass
class AudioEvent:
    audio: np.ndarray


@dataclass
class AudioChunkEvent:
    """Incremental PCM for frames [frame_offset, frame_offset + n_frames).

    Extension beyond the reference (which only delivers the final waveform,
    Qwen3+Streaming.swift:118-120): opt in via
    ``generate_stream(..., audio_chunk_frames=N)``. Chunks concatenate into
    a coherent waveform; the final AudioEvent still carries the exact
    full-utterance decode.
    """

    audio: np.ndarray
    frame_offset: int


def _device_peak_memory_gb() -> float:
    try:
        stats = jax.local_devices()[0].memory_stats()
        return (stats or {}).get("peak_bytes_in_use", 0) / 1e9
    except Exception:
        return 0.0


import functools


@functools.partial(
    jax.jit,
    static_argnames=(
        "talker_cfg", "cp_cfg", "sampling", "max_frames", "dec_cfg",
        "cache_len", "kv_quant",
    ),
)
def _generate_and_decode(
    talker_params,
    cp_params,
    voc_params,
    *,
    talker_cfg,
    cp_cfg,
    sampling,
    dec_cfg,
    prefill_embeds,
    prefill_len,
    trailing_embeds,
    trailing_len,
    tts_pad_embed,
    max_steps,
    max_frames,
    key,
    cache=None,
    cache_len: int = 0,
    kv_quant: bool = False,
):
    """The whole utterance — prefill, AR decode loop, AND vocoder — as ONE
    device program: the host is not involved between token generation and
    audio synthesis (one dispatch per utterance instead of two; the decode
    result never round-trips). Returns (codes, n_frames, wav, lengths).

    With ``cache=None`` (the single-chip production path) the KV cache is
    allocated *inside* the program from the static ``cache_len``/``kv_quant``
    — it never exists as a host-side input buffer, which is what used to
    trigger XLA's "donated buffers were not usable" copy (the lax.switch
    vocoder capture defeated input/output aliasing). Mesh callers still pass
    a pre-sharded ``cache`` so the sharding annotation propagates.

    The vocoder stage runs through a ``lax.switch`` over GEN_BUCKETS
    prefixes, decoding only the smallest bucket that covers ``n_frames``:
    a short utterance under a paragraph-sized ``max_frames`` cap no longer
    pays vocoder compute over the whole padded buffer (each branch zero-
    pads its waveform to the full-cap length so shapes agree; everything
    past ``n_frames * total_upsample`` is ignored by the caller anyway)."""
    if cache is None:
        cache = tk_mod.make_cache(
            talker_cfg, 1, cache_len, prefill_embeds.dtype, quantized=kv_quant
        )
    res = gen_mod.generate_codes(
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
        max_steps=max_steps,
        max_frames=max_frames,
        key=key,
    )
    buckets = [b for b in GEN_BUCKETS if b < max_frames] + [max_frames]
    up = dec_cfg.total_upsample

    def _branch(b):
        def f(codes, n):
            wav_b, len_b = vc_mod.decode(voc_params, dec_cfg, codes[:, :b], n)
            pad = (max_frames - b) * up
            if pad:
                wav_b = jnp.pad(wav_b, ((0, 0), (0, pad)))
            return wav_b, len_b

        return f

    if len(buckets) == 1:
        wav, lengths = _branch(buckets[0])(res.codes[None], res.n_frames)
    else:
        idx = sum(
            (res.n_frames > b).astype(jnp.int32) for b in buckets[:-1]
        )
        wav, lengths = jax.lax.switch(
            idx, [_branch(b) for b in buckets], res.codes[None], res.n_frames
        )
    return res.codes, res.n_frames, wav, lengths


@functools.partial(
    jax.jit,
    static_argnames=(
        "talker_cfg", "cp_cfg", "sampling", "max_frames", "dec_cfg",
        "cache_len", "kv_quant", "first_chunk", "win_bucket",
    ),
)
def _prefill_first_audio(
    talker_params,
    cp_params,
    voc_params,
    *,
    talker_cfg,
    cp_cfg,
    sampling,
    dec_cfg,
    prefill_embeds,
    prefill_len,
    trailing_embeds,
    trailing_len,
    tts_pad_embed,
    max_steps,
    max_frames,
    key,
    cache_len: int,
    kv_quant: bool = False,
    first_chunk: int = 12,
    win_bucket: int = 16,
):
    """The entire time-to-first-audio critical path as ONE device program:
    prefill + the first ``first_chunk`` decode frames + the first windowed
    vocoder decode. Production streaming used to spend three tunneled
    dispatches (prefill_start / generate_chunk / window vocode) plus a
    full-codes-buffer readback before the first PCM left the chip; here a
    single dispatch returns the resumable carry AND the first window's
    waveform (round-3 verdict #6: TTFA was structurally serial).

    The window is frames [0, win_bucket) decoded with ``min(step,
    win_bucket)`` valid frames — bit-identical to what
    ``_decode_audio_window(codes, 0, upto, step)`` computes for the first
    emit (same bucket, same buffer content, same valid count); the caller
    slices the emit-safe prefix ``[0, upto * total_upsample)`` on the host.
    The KV cache is allocated in-program (single-chip path, like
    _generate_and_decode); streaming then resumes via generate_chunk on the
    returned carry.
    """
    cache = tk_mod.make_cache(
        talker_cfg, 1, cache_len, prefill_embeds.dtype, quantized=kv_quant
    )
    carry = gen_mod.prefill_start.__wrapped__(
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
    carry = gen_mod.generate_chunk.__wrapped__(
        talker_params,
        cp_params,
        carry,
        talker_cfg=talker_cfg,
        cp_cfg=cp_cfg,
        sampling=sampling,
        trailing_embeds=trailing_embeds,
        trailing_len=trailing_len,
        tts_pad_embed=tts_pad_embed,
        until_step=jnp.minimum(jnp.int32(first_chunk), max_steps),
    )
    w = jnp.minimum(carry.step, jnp.int32(win_bucket))
    wav, _ = vc_mod.decode(voc_params, dec_cfg, carry.codes[None, :win_bucket], w)
    return carry, wav[0]


class Qwen3TTSModel:
    """Loaded model bundle + synthesis entry points."""

    def __init__(
        self,
        config: ModelConfig,
        talker_params,
        cp_params,
        vocoder_params=None,
        tokenizer_config=None,
        encoder_params=None,
        speaker_encoder_params=None,
        tokenizer=None,
        dtype=jnp.bfloat16,
        mesh=None,
        kv_cache_dtype: str = "bf16",
    ):
        if config.talker_config is None:
            raise Qwen3TTSError("Talker config is required")
        self.config = config
        self.talker_cfg: TalkerConfig = config.talker_config
        self.cp_cfg = self.talker_cfg.code_predictor_config
        self.talker_params = talker_params
        self.cp_params = cp_params
        self.vocoder_params = vocoder_params
        self.tokenizer_config = tokenizer_config
        self.encoder_params = encoder_params
        self.speaker_encoder_params = speaker_encoder_params
        self.tokenizer = tokenizer
        self.dtype = dtype
        if kv_cache_dtype not in ("bf16", "int8"):
            raise Qwen3TTSError(f"Unsupported kv_cache_dtype: {kv_cache_dtype!r}")
        # int8 KV cache (per-row scales): halves attention's HBM traffic in
        # the decode kernels — the dominant per-sequence cost of batched
        # serving. Opt-in; int8 rounding perturbs attention by ~0.4% rel.
        self.kv_quant = kv_cache_dtype == "int8"
        # optional jax.sharding.Mesh ("dp", "tp"): tensor-parallel serving
        # over ICI (extension beyond the single-device reference, SURVEY §2.4)
        self.mesh = mesh
        if mesh is not None:
            from .parallel import mesh as pm

            self.talker_params = pm.shard_talker(self.talker_params, mesh)
            if self.cp_params is not None:
                self.cp_params = pm.shard_cp(self.cp_params, mesh)
            for attr in ("vocoder_params", "encoder_params", "speaker_encoder_params"):
                v = getattr(self, attr)
                if v is not None:
                    setattr(self, attr, pm.replicate(v, mesh))
        # streaming chunk size (frames per device round-trip); 25 = 2 s audio
        self.stream_chunk_frames = 25
        # optional ActivationProfiler (utils/profiler.py); set by the CLI
        self.activation_profiler = None
        # wall time of the most recent prefill (prefill + first frame)
        self._last_prefill_time = 0.0
        # reproduce the reference's unnormalized-exp top-p bit-for-bit
        # (Qwen3.swift:92-117) instead of proper nucleus sampling
        self.ref_exact_top_p = False
        # GenerationInfo of the most recent generate*/generate_stream call
        self.last_info: GenerationInfo | None = None

    # ------------------------------------------------------------------
    # Loading
    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_path: str,
        dtype=jnp.bfloat16,
        keep_packed: bool | None = None,
        fuse: bool = False,
        quantize: str | None = None,
        mesh=None,
        kv_cache_dtype: str = "bf16",
    ) -> "Qwen3TTSModel":
        """Load config.json + safetensors (+ speech_tokenizer/, tokenizer)
        from a local directory (reference Qwen3.swift:1382-1495).

        ``keep_packed`` keeps int4/int8 weights packed for the Pallas
        dequant-in-matmul decode path (default: on iff quantized).
        ``fuse`` concatenates q/k/v and gate/up projections into single
        matmuls. Measured on v5e this is ~30% SLOWER for B=1 decode (XLA's
        matvec codegen prefers the narrower matmuls), so it is off by
        default; kept for experimentation on other topologies.
        ``quantize='int8'`` runtime-quantizes the talker + code-predictor
        matmul weights to weight-only int8 (per-output-channel symmetric),
        halving decode HBM traffic — measured 1.4x faster single-stream
        decode on v5e with near-lossless numerics. Works on any checkpoint
        (int4 checkpoints are dequantized first).
        ``kv_cache_dtype='int8'`` stores decode KV caches as int8 with
        per-row f32 scales, halving attention's HBM read traffic in the
        decode megakernels (the dominant per-sequence cost of batched
        serving; ~0.4% relative attention perturbation — no reference
        counterpart, TPU-side extension).
        ``mesh``: a ``jax.sharding.Mesh`` with ("dp", "tp") axes
        (parallel/mesh.py:make_mesh) — the talker + code predictor are
        TP-sharded over it (Megatron column/row layout, XLA collectives over
        ICI) and every generate* entry point runs under the mesh unchanged."""
        from .utils.loader import Checkpoint

        if quantize not in (None, "int8"):
            raise Qwen3TTSError(f"Unsupported quantize mode: {quantize!r}")
        if quantize is None and keep_packed is None:
            # TPU serving default for quantized (MLX affine int4/int8)
            # checkpoints: dequantize and requantize to weight-only int8 —
            # the packed dequant-in-matmul path is VPU-unpack bound on v5e
            # (RTF 0.108 vs 0.034, round-3 measurement) while int8 rides the
            # fused megakernels. Packed stays available as the low-memory
            # mode via keep_packed=True.
            import json as _json
            import os as _os

            try:
                with open(_os.path.join(model_path, "config.json")) as f:
                    _has_quant = bool(_json.load(f).get("quantization"))
            except (OSError, ValueError):
                _has_quant = False
            if _has_quant and jax.devices()[0].platform in ("tpu", "axon"):
                quantize = "int8"
        if quantize:
            keep_packed = False  # int4 ckpts: dequantize, then requantize int8
        ckpt = Checkpoint(model_path, dtype, keep_packed=keep_packed)
        # measured on v5e (round 2): fused qkv/gate-up is ~11% FASTER for the
        # int8 talker step (1.11 vs 1.25 ms) but slower for bf16 and for the
        # code predictor — auto-fuse exactly that case. TP sharding needs
        # unfused head groups, so a mesh disables it.
        # under int8 the CP runs in the fused Pallas kernel where one
        # qkv/gate-up matvec replaces 3/2 serial ones (the XLA-path "CP
        # fusion slower" measurement does not apply in-kernel). Dense bf16
        # on TPU also auto-fuses the talker: the whole-step kernel
        # (ops/talker_kernel.py mode='bf16') needs the fused layout.
        from .ops.quant import Int8Linear, PackedLinear

        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        _q0 = ckpt.talker_params["layers"]["q_proj"]
        bf16_kernel_ready = (
            on_tpu
            and quantize is None
            and not isinstance(_q0, (PackedLinear, Int8Linear))
            and _q0.dtype == jnp.bfloat16
        )
        fuse_talker = fuse or (
            mesh is None and (quantize == "int8" or bf16_kernel_ready)
        )
        if fuse_talker:
            ckpt.talker_params["layers"] = tk_mod.fuse_layer_projections(
                ckpt.talker_params["layers"]
            )
        # CP fusion only helps inside the int8 CP kernel; the bf16 CP stays
        # on the XLA path where unfused matvecs measured faster
        if (fuse or (quantize == "int8" and mesh is None)) and ckpt.cp_params is not None:
            ckpt.cp_params["layers"] = tk_mod.fuse_layer_projections(
                ckpt.cp_params["layers"]
            )
        if quantize == "int8":
            from .ops.quant import quantize_decode_params_int8

            ckpt.talker_params = quantize_decode_params_int8(
                ckpt.talker_params, "codec_head"
            )
            if ckpt.cp_params is not None:
                ckpt.cp_params = quantize_decode_params_int8(
                    ckpt.cp_params, "lm_head"
                )
        tokenizer = None
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(model_path)
        except Exception as ex:
            # non-fatal (codes-only workflows don't need text), but say so
            # now — otherwise the first symptom is a "Tokenizer not loaded"
            # error much later, far from the cause
            import warnings

            warnings.warn(
                f"could not load a text tokenizer from {model_path}: {ex!r}; "
                "text synthesis entry points will raise until one is available",
                stacklevel=2,
            )
        return cls(
            config=ckpt.config,
            talker_params=ckpt.talker_params,
            cp_params=ckpt.cp_params,
            vocoder_params=ckpt.vocoder_params,
            tokenizer_config=ckpt.tokenizer_config,
            encoder_params=ckpt.encoder_params,
            speaker_encoder_params=ckpt.speaker_encoder_params,
            tokenizer=tokenizer,
            dtype=dtype,
            mesh=mesh,
            kv_cache_dtype=kv_cache_dtype,
        )

    # ------------------------------------------------------------------
    # Introspection (reference Qwen3.swift:964-971, 1205-1214, 1262-1271)
    # ------------------------------------------------------------------

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def tts_model_type(self) -> str:
        return self.config.tts_model_type

    @property
    def supported_speakers(self) -> list[str]:
        return sorted(self.talker_cfg.speaker_ids)

    @property
    def has_voice_cloning(self) -> bool:
        return self.speaker_encoder_params is not None

    @property
    def supports_voice_cloning(self) -> bool:
        return self.config.tts_model_type == "base" and self.encoder_params is not None

    # ------------------------------------------------------------------
    # Prompt construction (reference Qwen3.swift:259-409)
    # ------------------------------------------------------------------

    def _encode_text(self, text: str) -> jnp.ndarray:
        if self.tokenizer is None:
            raise Qwen3TTSError("Tokenizer not loaded")
        ids = self.tokenizer.encode(text)
        return jnp.asarray(ids, jnp.int32)[None]

    def _embed_project(self, ids: jnp.ndarray) -> jnp.ndarray:
        raw = tk_mod.embed_text(self.talker_params, self.talker_cfg, ids)
        return tk_mod.resize_mlp(self.talker_params["text_projection"], raw)

    def _tts_special_embeds(self):
        ids = jnp.asarray(
            [
                [
                    self.config.tts_bos_token_id,
                    self.config.tts_eos_token_id,
                    self.config.tts_pad_token_id,
                ]
            ],
            jnp.int32,
        )
        e = self._embed_project(ids)
        return e[:, 0:1], e[:, 1:2], e[:, 2:3]  # bos, eos, pad each [1,1,h]

    def _resolve_language_id(self, language: str, speaker: str | None) -> int | None:
        cfg = self.talker_cfg
        lang = language.lower()
        language_id = cfg.language_ids.get(lang) if lang != "auto" else None
        # dialect override (e.g. Eric -> sichuan_dialect, Qwen3.swift:311-319)
        if lang in ("chinese", "auto") and speaker:
            dialect = cfg.speaker_dialects.get(speaker.lower())
            if dialect and dialect in cfg.language_ids:
                language_id = cfg.language_ids[dialect]
        return language_id

    def _codec_prefix_ids(self, language_id: int | None) -> list[int]:
        cfg = self.talker_cfg
        if language_id is None:
            return [cfg.codec_nothink_id, cfg.codec_think_bos_id, cfg.codec_think_eos_id]
        return [
            cfg.codec_think_id,
            cfg.codec_think_bos_id,
            language_id,
            cfg.codec_think_eos_id,
        ]

    def _build_codec_prefix(
        self, language_id: int | None, speaker_embed: jnp.ndarray | None
    ) -> jnp.ndarray:
        """[think-prefix ..., (speaker,) pad, bos] codec-side embeddings."""
        cfg = self.talker_cfg
        emb = tk_mod.embed_codec(
            self.talker_params, jnp.asarray([self._codec_prefix_ids(language_id)], jnp.int32)
        )
        suffix = tk_mod.embed_codec(
            self.talker_params,
            jnp.asarray([[cfg.codec_pad_id, cfg.codec_bos_id]], jnp.int32),
        )
        parts = [emb]
        if speaker_embed is not None:
            parts.append(speaker_embed.reshape(1, 1, -1).astype(emb.dtype))
        parts.append(suffix)
        return jnp.concatenate(parts, axis=1)

    def _prepare_generation_inputs(
        self,
        text: str,
        language: str = "auto",
        speaker: str | None = None,
        instruct: str | None = None,
        speaker_embed: jnp.ndarray | None = None,
    ):
        """Non-ICL prefill construction (reference Qwen3.swift:259-409).

        Returns (input_embeds [1,P,h], trailing [T,h], tts_pad [h]).
        """
        cfg = self.talker_cfg
        text_ids = self._encode_text(CHAT_ASSISTANT.format(text))
        text_embed = self._embed_project(text_ids)
        tts_bos, tts_eos, tts_pad = self._tts_special_embeds()

        if speaker_embed is None and speaker is not None:
            spk_token = cfg.speaker_ids.get(speaker.lower())
            if spk_token is not None:
                speaker_embed = tk_mod.embed_codec(
                    self.talker_params, jnp.asarray([spk_token], jnp.int32)
                )

        language_id = self._resolve_language_id(language, speaker)
        codec_embed = self._build_codec_prefix(language_id, speaker_embed)
        codec_len = codec_embed.shape[1]

        instruct_embed = None
        if instruct:
            instruct_embed = self._embed_project(
                self._encode_text(CHAT_USER.format(instruct))
            )

        role_embed = text_embed[:, 0:3]
        # tts_pad * (codec_len - 2) + tts_bos, overlaid on codec prefix[:-1]
        pad_count = codec_len - 2
        combined = jnp.concatenate(
            [jnp.broadcast_to(tts_pad, (1, pad_count, tts_pad.shape[-1])), tts_bos], axis=1
        )
        combined = combined + codec_embed[:, : codec_len - 1]

        parts = [instruct_embed] if instruct_embed is not None else []
        parts += [role_embed, combined]
        # first text token + codec bos (Qwen3.swift:390-391)
        first_text = text_embed[:, 3:4] + codec_embed[:, codec_len - 1 :]
        parts.append(first_text)
        input_embeds = jnp.concatenate(parts, axis=1)

        # trailing text stream: tokens[4 : len-5] + tts_eos (Qwen3.swift:393-408)
        text_len = text_embed.shape[1]
        if text_len - 5 > 4:
            trailing = jnp.concatenate([text_embed[:, 4 : text_len - 5], tts_eos], axis=1)
        else:
            trailing = tts_eos
        return input_embeds, trailing[0], tts_pad[0, 0]

    def _prepare_icl_generation_inputs(
        self, text: str, ref_audio: np.ndarray, ref_text: str, language: str = "auto"
    ):
        """ICL (voice-clone) prefill (reference Qwen3.swift:418-582).

        Returns (input_embeds, trailing [1,h], tts_pad [h], ref_codes [1,16,T]).
        """
        cfg = self.talker_cfg
        if self.encoder_params is None or self.tokenizer_config is None:
            raise Qwen3TTSError("Speech tokenizer encoder not available")
        enc_cfg = self.tokenizer_config.encoder_config
        audio = jnp.asarray(np.asarray(ref_audio, np.float32))[None]
        ref_codes = enc_mod.encode(
            self.encoder_params,
            enc_cfg,
            audio,
            self.tokenizer_config.encoder_valid_num_quantizers,
        )  # [1, 16, T]

        ref_ids = self._encode_text(CHAT_ASSISTANT_CLOSED.format(ref_text))
        ref_text_ids = ref_ids[:, 3 : ref_ids.shape[1] - 2]
        target_ids = self._encode_text(CHAT_ASSISTANT.format(text))
        text_ids = target_ids[:, 3 : target_ids.shape[1] - 5]

        tts_bos, tts_eos, tts_pad = self._tts_special_embeds()

        combined_ids = jnp.concatenate([ref_text_ids, text_ids], axis=1)
        text_embed = jnp.concatenate([self._embed_project(combined_ids), tts_eos], axis=1)
        text_lens = text_embed.shape[1]

        # codec side: codec_bos + summed 16-codebook embeddings of ref codes
        first_cb = ref_codes[:, 0]
        ref_codec = tk_mod.embed_codec(self.talker_params, first_cb)
        for i in range(cfg.num_code_groups - 1):
            ref_codec = ref_codec + self.cp_params["codec_embedding"][i][ref_codes[:, i + 1]]
        codec_bos = tk_mod.embed_codec(
            self.talker_params, jnp.asarray([[cfg.codec_bos_id]], jnp.int32)
        )
        codec_icl = jnp.concatenate([codec_bos, ref_codec.astype(codec_bos.dtype)], axis=1)
        codec_lens = codec_icl.shape[1]

        # non-streaming overlay: text+codec_pad || codec+tts_pad
        codec_pad = tk_mod.embed_codec(
            self.talker_params, jnp.asarray([[cfg.codec_pad_id]], jnp.int32)
        )
        text_part = text_embed + jnp.broadcast_to(codec_pad, (1, text_lens, codec_pad.shape[-1]))
        codec_part = codec_icl + jnp.broadcast_to(tts_pad, (1, codec_lens, tts_pad.shape[-1]))
        icl_embed = jnp.concatenate([text_part, codec_part], axis=1)

        language_id = self._resolve_language_id(language, None)

        speaker_embed = None
        if self.speaker_encoder_params is not None:
            speaker_embed = spk_mod.extract_embedding(
                self.speaker_encoder_params,
                self.config.speaker_encoder_config,
                jnp.asarray(np.asarray(ref_audio, np.float32)),
            )

        codec_prefix = self._build_codec_prefix(language_id, speaker_embed)
        prefix_len = codec_prefix.shape[1]
        role_embed = self._embed_project(target_ids[:, 0:3])
        pad_count = prefix_len - 2
        combined_prefix = jnp.concatenate(
            [jnp.broadcast_to(tts_pad, (1, pad_count, tts_pad.shape[-1])), tts_bos], axis=1
        )
        combined_prefix = combined_prefix + codec_prefix[:, : prefix_len - 1]

        input_embeds = jnp.concatenate([role_embed, combined_prefix, icl_embed], axis=1)
        return input_embeds, tts_pad[0], tts_pad[0, 0], ref_codes

    # ------------------------------------------------------------------
    # Core synthesis driver
    # ------------------------------------------------------------------

    def _effective_max_tokens(self, text: str, max_tokens: int) -> int:
        """min(max_tokens, max(75, 6*text_tokens)) (Qwen3.swift:615-616)."""
        n = len(self.tokenizer.encode(text)) if self.tokenizer else len(text)
        return min(max_tokens, max(75, n * 6))

    def _mesh_scope(self):
        """Ambient-mesh context for device calls (nullcontext when unsharded)."""
        if self.mesh is None:
            import contextlib

            return contextlib.nullcontext()
        return jax.set_mesh(self.mesh)

    def _sampling(
        self, temperature: float, top_k: int, top_p: float, repetition_penalty: float
    ) -> SamplingConfig:
        return SamplingConfig(
            temperature,
            top_k,
            top_p,
            repetition_penalty,
            ref_exact_top_p=self.ref_exact_top_p,
        )

    def _prep_run(
        self, input_embeds, trailing, tts_pad, max_steps: int, alloc_cache: bool = True
    ) -> dict:
        """Bucket/pad prompt + trailing streams, allocate the KV cache.

        With ``alloc_cache=False`` the dict carries the static
        ``cache_len``/``kv_quant`` instead of a device cache buffer — for
        programs that allocate their cache internally (_generate_and_decode
        on a single chip)."""
        p_len = input_embeds.shape[1]
        p_bucket = pad_to_bucket(p_len)
        prefill = jnp.pad(
            input_embeds.astype(self.dtype), ((0, 0), (0, p_bucket - p_len), (0, 0))
        )
        max_frames = pad_to_bucket(max_steps, GEN_BUCKETS)
        # trailing buffer padded to a bucket as well (shape stability)
        t_len = trailing.shape[0]
        t_bucket = pad_to_bucket(t_len)
        trailing_p = jnp.pad(trailing.astype(self.dtype), ((0, t_bucket - t_len), (0, 0)))
        # round the cache up to 128 so the Pallas decode-attention kernel
        # (128-row blocks) is eligible
        cache_len = -(-(p_bucket + max_frames) // 128) * 128
        out = dict(
            prefill_embeds=prefill,
            prefill_len=jnp.int32(p_len),
            trailing_embeds=trailing_p,
            trailing_len=jnp.int32(t_len),
            tts_pad_embed=tts_pad.astype(self.dtype),
            max_frames=max_frames,
        )
        if not alloc_cache:
            out["cache_len"] = cache_len
            out["kv_quant"] = self.kv_quant
            return out
        cache = tk_mod.make_cache(
            self.talker_cfg, 1, cache_len, self.dtype, quantized=self.kv_quant
        )
        if self.mesh is not None:
            from .parallel import mesh as pm

            cache = pm.shard_cache(cache, self.mesh)
        out["cache"] = cache
        return out

    def _set_info(self, n_tokens: int, prompt_tokens: int, prefill_t: float, gen_t: float):
        self.last_info = GenerationInfo(
            prompt_token_count=prompt_tokens,
            generation_token_count=n_tokens,
            prefill_time=prefill_t,
            generate_time=gen_t,
            tokens_per_second=n_tokens / max(gen_t, 1e-9),
            peak_memory_usage=_device_peak_memory_gb(),
        )
        return self.last_info

    def _run_generation(
        self,
        input_embeds: jnp.ndarray,
        trailing: jnp.ndarray,
        tts_pad: jnp.ndarray,
        *,
        sampling: SamplingConfig,
        max_steps: int,
        seed: int,
        on_token: Callable[[int], None] | None = None,
    ) -> tuple[np.ndarray, int]:
        """Bucketed prefill + fused decode; returns (codes [n,16], n_frames)."""
        if self.cp_params is None or self.cp_cfg is None:
            raise Qwen3TTSError("Code predictor not available")
        # single-chip non-streaming: the fused program allocates its cache
        # internally (no host input buffer, nothing to donate); the chunked
        # streaming path and mesh callers need a real (pre-sharded) cache
        prep = self._prep_run(
            input_embeds, trailing, tts_pad, max_steps,
            alloc_cache=on_token is not None or self.mesh is not None,
        )
        common = dict(
            talker_cfg=self.talker_cfg,
            cp_cfg=self.cp_cfg,
            sampling=sampling,
        )
        key = jax.random.PRNGKey(seed)
        if on_token is None:
            # non-streaming: the whole utterance as one device program
            t0 = time.time()
            with self._mesh_scope():
                res = gen_mod.generate_codes_fused(
                    self.talker_params,
                    self.cp_params,
                    **common,
                    **prep,
                    max_steps=jnp.int32(max_steps),
                    key=key,
                )
                n = int(res.n_frames)
            gen_t = time.time() - t0
            if n == 0:
                raise Qwen3TTSError("No tokens generated")
            # prefill is fused into the same program; report it as 0 rather
            # than guessing (the chunked/streaming path reports it measured)
            self._set_info(n, input_embeds.shape[1], 0.0, gen_t)
            codes = np.asarray(res.codes)
            if (
                self.activation_profiler is not None
                and self.activation_profiler.is_enabled
            ):
                self._profile_replay(input_embeds, trailing, tts_pad, codes, n)
            return codes, n

        t0 = time.time()
        codes = None
        n = 0
        for new_tokens, step, codes_np, done, _ in self._stream_codes(
            prep, sampling, max_steps, seed
        ):
            for t in new_tokens:
                on_token(t)
            if done:
                codes, n = codes_np, step
        if n == 0:
            raise Qwen3TTSError("No tokens generated")
        self._set_info(
            n, input_embeds.shape[1], self._last_prefill_time,
            time.time() - t0 - self._last_prefill_time,
        )
        if self.activation_profiler is not None and self.activation_profiler.is_enabled:
            self._profile_replay(input_embeds, trailing, tts_pad, codes, n)
        return codes, n

    # fused gen+vocoder cap. Since round 3 the fused program decodes only
    # the smallest GEN_BUCKET covering n_frames (lax.switch inside
    # _generate_and_decode), so paragraph-length caps keep the one-dispatch
    # path; the cap only bounds compile time (one vocoder branch per
    # bucket) and the padded waveform buffer
    FUSED_AUDIO_MAX_FRAMES = 1024

    def _run_generation_audio(
        self, input_embeds, trailing, tts_pad, *, sampling, max_steps, seed
    ) -> np.ndarray:
        """Non-streaming synthesis; uses the single-program gen+vocoder path
        when eligible (one device dispatch per utterance, no host round-trip
        between decode loop and vocoder)."""
        if self.cp_params is None or self.cp_cfg is None:
            raise Qwen3TTSError("Code predictor not available")
        if self.vocoder_params is None or self.tokenizer_config is None:
            raise Qwen3TTSError("Speech tokenizer not loaded")
        max_frames = pad_to_bucket(max_steps, GEN_BUCKETS)
        if max_frames > self.FUSED_AUDIO_MAX_FRAMES:
            codes, n = self._run_generation(
                input_embeds, trailing, tts_pad,
                sampling=sampling, max_steps=max_steps, seed=seed,
            )
            return self._decode_audio(codes, n)
        # single-chip: the fused program allocates its cache internally (no
        # host input buffer, no failed-donation copy); mesh callers pass a
        # pre-sharded cache so the sharding annotation propagates
        prep = self._prep_run(
            input_embeds, trailing, tts_pad, max_steps, alloc_cache=self.mesh is not None
        )
        dec_cfg = self.tokenizer_config.decoder_config
        t0 = time.time()
        with self._mesh_scope():
            codes, n_frames, wav, lengths = _generate_and_decode(
                self.talker_params,
                self.cp_params,
                self.vocoder_params,
                talker_cfg=self.talker_cfg,
                cp_cfg=self.cp_cfg,
                sampling=sampling,
                dec_cfg=dec_cfg,
                **prep,
                max_steps=jnp.int32(max_steps),
                key=jax.random.PRNGKey(seed),
            )
            n = int(n_frames)
        gen_t = time.time() - t0
        if n == 0:
            raise Qwen3TTSError("No tokens generated")
        self._set_info(n, input_embeds.shape[1], 0.0, gen_t)
        if self.activation_profiler is not None and self.activation_profiler.is_enabled:
            self._profile_replay(input_embeds, trailing, tts_pad, np.asarray(codes), n)
        out = np.asarray(wav)[0][: n * dec_cfg.total_upsample]
        valid = int(lengths[0])
        if 0 < valid < out.shape[0]:
            out = out[:valid]
        return out

    def _stream_codes(
        self,
        prep: dict,
        sampling: SamplingConfig,
        max_steps: int,
        seed: int,
        first_audio: bool = False,
    ):
        """Drive prefill_start + generate_chunk; yield between device chunks.

        Yields (new_tokens, total_frames, codes [max_frames,16] np, done,
        first_pcm) — the host reads token/code buffers back between chunks,
        so consumers observe tokens WHILE the utterance is still being
        generated (no host callbacks; the tunneled TPU backend cannot run
        io_callback).

        ``first_audio=True`` (single-chip audio streaming): the first
        iteration runs :func:`_prefill_first_audio` — prefill, the first
        ~12 decode frames, AND the first vocoder window in one dispatch —
        and the first yield carries that window's PCM in ``first_pcm``
        (float32 [win_bucket * upsample]; every other yield has None).
        ``prep`` must then carry ``cache_len``/``kv_quant`` instead of a
        device cache (see _prep_run(alloc_cache=False)).

        The next chunk is dispatched BEFORE yielding (the readbacks above
        the dispatch satisfy generate_chunk's carry donation), so the
        device decodes chunk N+1 while the consumer cuts window N's PCM.
        """
        common = dict(
            talker_cfg=self.talker_cfg, cp_cfg=self.cp_cfg, sampling=sampling
        )
        chunk_args = dict(
            trailing_embeds=prep["trailing_embeds"],
            trailing_len=prep["trailing_len"],
            tts_pad_embed=prep["tts_pad_embed"],
        )
        chunk = self.stream_chunk_frames
        # the first device chunk is just big enough to clear the vocoder
        # lookahead plus the first audio emit — the host sees tokens (and
        # can vocode first PCM) after ~12 frames instead of a full chunk
        first_chunk = min(
            chunk, self.STREAM_FIRST_AUDIO_FRAMES + self.STREAM_LOOKAHEAD_FRAMES
        )
        first_pcm = None
        t0 = time.time()
        with self._mesh_scope():
            if first_audio:
                carry, wav0 = _prefill_first_audio(
                    self.talker_params,
                    self.cp_params,
                    self.vocoder_params,
                    **common,
                    **prep,
                    dec_cfg=self.tokenizer_config.decoder_config,
                    max_steps=jnp.int32(max_steps),
                    first_chunk=first_chunk,
                    win_bucket=self.STREAM_BUCKETS[0],
                    key=jax.random.PRNGKey(seed),
                )
                first_pcm = np.asarray(wav0)
            else:
                carry = gen_mod.prefill_start(
                    self.talker_params,
                    self.cp_params,
                    **common,
                    **prep,
                    key=jax.random.PRNGKey(seed),
                )
                jax.block_until_ready(carry.tokens)
        # with first_audio this includes the first chunk + vocoder window
        # (one program — the split isn't observable without extra dispatches)
        self._last_prefill_time = time.time() - t0
        emitted = 0
        while True:
            step = int(carry.step)
            done = bool(carry.eos) or step >= max_steps
            # full-buffer readback + host slice: a device-side [:step] slice
            # would compile a new remote program per distinct step value
            tokens = np.asarray(carry.tokens)[:step]
            new = [int(t) for t in tokens[emitted:] if t >= 0]
            emitted = step
            codes_np = np.asarray(carry.codes)
            if not done:
                # dispatch the next chunk before yielding: generate_chunk
                # donates `carry` (everything needed was read back above),
                # and the device works while the consumer vocodes
                cur = first_chunk if emitted <= first_chunk else chunk
                with self._mesh_scope():
                    carry = gen_mod.generate_chunk(
                        self.talker_params,
                        self.cp_params,
                        carry,
                        **chunk_args,
                        until_step=jnp.int32(min(step + cur, max_steps)),
                        **common,
                    )
            yield new, step, codes_np, done, first_pcm
            first_pcm = None
            if done:
                return

    def _profile_replay(self, input_embeds, trailing, tts_pad, codes, n: int):
        """Replay the generated sequence (teacher forcing) to collect
        per-neuron FFN activation maxima (see utils/profiler.py)."""
        if n > 1:
            code0 = jnp.asarray(codes[: n - 1, 0], jnp.int32)
            rest = jnp.asarray(codes[: n - 1, 1:], jnp.int32)
            codec = cp_mod.sum_codec_embeddings(
                self.cp_params, self.talker_params, code0, rest
            )  # [n-1, h]
            steps = jnp.arange(n - 1)
            t_len = trailing.shape[0]
            text = jnp.where(
                (steps < t_len)[:, None],
                trailing[jnp.minimum(steps, t_len - 1)],
                tts_pad[None],
            )
            decode_inputs = (text + codec)[None].astype(self.dtype)
            seq = jnp.concatenate([input_embeds.astype(self.dtype), decode_inputs], axis=1)
        else:
            seq = input_embeds.astype(self.dtype)
        acts = tk_mod.activation_stats(self.talker_params, self.talker_cfg, seq)
        self.activation_profiler.record(np.asarray(acts))

    def _decode_audio(self, codes: np.ndarray, n_frames: int) -> np.ndarray:
        """Bucketed vocoder decode + validity trim (Qwen3.swift:744-754)."""
        if self.vocoder_params is None or self.tokenizer_config is None:
            raise Qwen3TTSError("Speech tokenizer not loaded")
        dec_cfg = self.tokenizer_config.decoder_config
        t_bucket = pad_to_bucket(n_frames, GEN_BUCKETS)
        buf = np.zeros((1, t_bucket, dec_cfg.num_quantizers), np.int32)
        buf[0, : min(n_frames, codes.shape[0])] = codes[:n_frames]
        with self._mesh_scope():
            wav, lengths = vc_mod.decode(
                self.vocoder_params, dec_cfg, jnp.asarray(buf), jnp.int32(n_frames)
            )
        valid = int(lengths[0])
        # readback then slice on host (device-side dynamic slices recompile
        # per shape; the padded tail transfer is cheaper than a compile)
        out = np.asarray(wav)[0][: n_frames * dec_cfg.total_upsample]
        if 0 < valid < out.shape[0]:
            out = out[:valid]
        return out

    # ------------------------------------------------------------------
    # Public generation entry points
    # ------------------------------------------------------------------

    def generate_voice_design(
        self,
        text: str,
        language: str = "auto",
        instruct: str | None = None,
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        repetition_penalty: float = 1.05,
        max_tokens: int = 2048,
        seed: int = 0,
        on_token: Callable[[int], None] | None = None,
    ) -> np.ndarray:
        """VoiceDesign synthesis (reference Qwen3.swift:587-755)."""
        embeds, trailing, pad = self._prepare_generation_inputs(
            text, language=language, speaker=None, instruct=instruct
        )
        sampling = self._sampling(temperature, top_k, top_p, repetition_penalty)
        max_steps = self._effective_max_tokens(text, max_tokens)
        if on_token is None:
            return self._run_generation_audio(
                embeds, trailing, pad, sampling=sampling, max_steps=max_steps,
                seed=seed,
            )
        codes, n = self._run_generation(
            embeds, trailing, pad,
            sampling=sampling, max_steps=max_steps, seed=seed, on_token=on_token,
        )
        return self._decode_audio(codes, n)

    def generate_custom_voice(
        self,
        text: str,
        speaker: str,
        language: str = "auto",
        instruct: str | None = None,
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        repetition_penalty: float = 1.05,
        max_tokens: int = 2048,
        seed: int = 0,
        on_token: Callable[[int], None] | None = None,
    ) -> np.ndarray:
        """CustomVoice/Base synthesis (reference Qwen3.swift:783-962)."""
        speakers = self.talker_cfg.speaker_ids
        if not speakers:
            raise Qwen3TTSError(
                "This model does not support CustomVoice. No speakers defined."
            )
        if speaker.lower() not in speakers:
            raise Qwen3TTSError(
                f"Speaker '{speaker}' not found. Available speakers: "
                + ", ".join(sorted(speakers))
            )
        embeds, trailing, pad = self._prepare_generation_inputs(
            text, language=language, speaker=speaker, instruct=instruct
        )
        sampling = self._sampling(temperature, top_k, top_p, repetition_penalty)
        max_steps = self._effective_max_tokens(text, max_tokens)
        if on_token is None:
            return self._run_generation_audio(
                embeds, trailing, pad, sampling=sampling, max_steps=max_steps,
                seed=seed,
            )
        codes, n = self._run_generation(
            embeds, trailing, pad,
            sampling=sampling, max_steps=max_steps, seed=seed, on_token=on_token,
        )
        return self._decode_audio(codes, n)

    def generate_voice_clone(
        self,
        text: str,
        reference_audio: np.ndarray,
        reference_text: str,
        language: str = "auto",
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        repetition_penalty: float = 1.5,
        max_tokens: int = 2048,
        seed: int = 0,
        on_token: Callable[[int], None] | None = None,
    ) -> np.ndarray:
        """ICL voice cloning (reference Qwen3.swift:1009-1203)."""
        if self.vocoder_params is None:
            raise Qwen3TTSError("Speech tokenizer not loaded")
        if self.encoder_params is None:
            raise Qwen3TTSError(
                "Voice cloning (ICL mode) requires the speech tokenizer encoder. "
                "Make sure to load a model with encoder weights."
            )
        embeds, trailing, pad, ref_codes = self._prepare_icl_generation_inputs(
            text, reference_audio, reference_text, language
        )
        codes, n = self._run_generation(
            embeds,
            trailing,
            pad,
            sampling=self._sampling(temperature, top_k, top_p, repetition_penalty),
            max_steps=self._effective_max_tokens(text, max_tokens),
            seed=seed,
            on_token=on_token,
        )
        # prepend reference codes for vocoder context, then proportional trim
        # (reference Qwen3.swift:1171-1199)
        ref = np.asarray(ref_codes[0]).T  # [T_ref, 16]
        full = np.concatenate([ref, codes[:n]], axis=0)
        ref_len, total_len = ref.shape[0], full.shape[0]
        audio = self._decode_audio(full, total_len)
        cut = int(ref_len / max(total_len, 1) * audio.shape[0])
        if 0 < cut < audio.shape[0]:
            audio = audio[cut:]
        return audio

    def generate(
        self,
        text: str,
        speaker: str | None = None,
        instruct: str | None = None,
        language: str = "auto",
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        repetition_penalty: float = 1.05,
        max_tokens: int = 2048,
        seed: int = 0,
        on_token: Callable[[int], None] | None = None,
        return_info: bool = False,
    ) -> np.ndarray | tuple[np.ndarray, GenerationInfo]:
        """Route by model type (reference Qwen3.swift:1291-1373).

        ``return_info=True`` returns (audio, GenerationInfo) — token counts,
        prefill/generate times, tok/s, peak device memory (the reference only
        surfaces these through the streaming path,
        Core/GenerationTypes.swift:15-46). ``self.last_info`` is populated on
        every call either way.
        """
        kwargs = dict(
            language=language,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            repetition_penalty=repetition_penalty,
            max_tokens=max_tokens,
            seed=seed,
            on_token=on_token,
        )
        mode = self.config.tts_model_type
        if mode == "voice_design":
            if instruct is None:
                raise Qwen3TTSError(
                    "VoiceDesign model requires 'instruct' to describe the voice "
                    "(e.g., 'A cheerful young female voice with high pitch')"
                )
            audio = self.generate_voice_design(text, instruct=instruct, **kwargs)
        elif mode == "custom_voice":
            if speaker is None:
                raise Qwen3TTSError(
                    "CustomVoice model requires 'speaker'. Available speakers: "
                    + ", ".join(self.supported_speakers)
                )
            audio = self.generate_custom_voice(text, speaker, instruct=instruct, **kwargs)
        elif mode == "base":
            if speaker is None:
                raise Qwen3TTSError(
                    "Base model requires 'speaker'. Available speakers: "
                    + ", ".join(self.supported_speakers)
                )
            audio = self.generate_custom_voice(text, speaker, instruct=None, **kwargs)
        else:
            audio = self.generate_voice_design(text, instruct=instruct, **kwargs)
        return (audio, self.last_info) if return_info else audio

    def generate_batch(
        self,
        texts: list[str],
        speakers: list[str] | None = None,
        instructs: list[str] | None = None,
        language: str = "auto",
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        repetition_penalty: float = 1.05,
        max_tokens: int = 2048,
        seed: int = 0,
        dp_mesh=None,
    ) -> list[np.ndarray]:
        """Batched serving: synthesize N utterances in one lockstep decode.

        Production extension beyond the reference (which is batch-1):
        single-token decode is weight-bandwidth-bound, so N sequences share
        the same weight stream at near-constant step latency — throughput
        per chip scales with N. Returns one waveform per input text.

        ``dp_mesh``: a tp=1 ``("dp", "tp")`` mesh (parallel/mesh.py:
        make_mesh(tp=1)) — the decode is shard_map'd over "dp": weights
        replicated per device, sequences sharded, so each device runs the
        UNMODIFIED single-chip fast path (megakernels included) on its
        B/dp shard and throughput scales with the device count
        (parallel/dp.py). Requires a model loaded WITHOUT ``mesh=`` (dp
        replicas are the scale-out story for models that fit one chip; TP
        is for models that don't) and B divisible by the dp size.

        Unlike generate(), a sequence that samples EOS on its very first
        frame yields an EMPTY waveform instead of raising — partial results
        are preferable to failing the whole batch; check ``len(audio)``.
        """
        from .models import batch_generate as bg

        B = len(texts)
        if B == 0:
            return []
        if dp_mesh is not None:
            self._validate_dp(dp_mesh, B, "generate_batch", "batch")
        speakers = speakers if speakers is not None else [None] * B
        instructs = instructs if instructs is not None else [None] * B
        if len(speakers) != B or len(instructs) != B:
            raise Qwen3TTSError(
                f"generate_batch: texts ({B}), speakers ({len(speakers)}) and "
                f"instructs ({len(instructs)}) must have equal lengths"
            )
        built = self._build_batch_inputs(texts, speakers, instructs, language)

        p_bucket = pad_to_bucket(max(e.shape[1] for e, _, _ in built))
        t_bucket = pad_to_bucket(max(t.shape[0] for _, t, _ in built))
        prefill = jnp.stack(
            [
                jnp.pad(e[0].astype(self.dtype), ((0, p_bucket - e.shape[1]), (0, 0)))
                for e, _, _ in built
            ]
        )
        trailing = jnp.stack(
            [
                jnp.pad(t.astype(self.dtype), ((0, t_bucket - t.shape[0]), (0, 0)))
                for _, t, _ in built
            ]
        )
        prefill_lens = jnp.asarray([e.shape[1] for e, _, _ in built], jnp.int32)
        trailing_lens = jnp.asarray([t.shape[0] for _, t, _ in built], jnp.int32)
        tts_pad = built[0][2].astype(self.dtype)

        caps = [self._effective_max_tokens(t, max_tokens) for t in texts]
        max_frames = pad_to_bucket(max(caps), GEN_BUCKETS)
        cache_len = -(-(p_bucket + max_frames) // 128) * 128
        cache = tk_mod.make_cache(
            self.talker_cfg, B, cache_len, self.dtype, quantized=self.kv_quant
        )
        if self.mesh is not None:
            from .parallel import mesh as pm

            cache = pm.shard_cache(cache, self.mesh)
        kwargs = dict(
            talker_cfg=self.talker_cfg,
            cp_cfg=self.cp_cfg,
            sampling=self._sampling(temperature, top_k, top_p, repetition_penalty),
            prefill_embeds=prefill,
            prefill_lens=prefill_lens,
            trailing_embeds=trailing,
            trailing_lens=trailing_lens,
            tts_pad_embed=tts_pad,
            cache=cache,
            max_steps=jnp.asarray(caps, jnp.int32),
            max_frames=max_frames,
            key=jax.random.PRNGKey(seed),
        )
        if dp_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            from .parallel.dp import generate_codes_batch_dp

            # materialize the cache sharded (the big buffer: [L,B,Hkv,T,D]
            # must never sit whole on one device at serving batch sizes)
            kwargs["cache"] = jax.device_put(
                cache, NamedSharding(dp_mesh, Pspec(None, "dp"))
            )
            res = generate_codes_batch_dp(
                self.talker_params, self.cp_params, mesh=dp_mesh, **kwargs
            )
            n_frames = np.asarray(res.n_frames)
        else:
            with self._mesh_scope():
                res = bg.generate_codes_batch(
                    self.talker_params, self.cp_params, **kwargs
                )
                n_frames = np.asarray(res.n_frames)
        if (n_frames == 0).all():
            raise Qwen3TTSError("No tokens generated")
        codes_np = np.asarray(res.codes)
        audio = self._decode_audio_list(
            [codes_np[b] for b in range(B)], np.maximum(n_frames, 1)
        )
        return [a if n_frames[b] else a[:0] for b, a in enumerate(audio)]

    def _validate_dp(self, dp_mesh, divisible: int, api: str,
                     what: str = "slots") -> None:
        """Typed, EAGER validation for every dp_mesh surface: wraps
        parallel.dp's ValueErrors in Qwen3TTSError and checks the
        batch/slot decomposition at the call site (the server is built
        lazily — without this, misconfiguration would surface as a runtime
        fault inside a worker thread on the first live request)."""
        from .parallel.dp import dp_size

        if self.mesh is not None:
            raise Qwen3TTSError(
                f"{api}(dp_mesh=) needs a model loaded without mesh= "
                "(dp replicates the single-chip configuration; it does not "
                "compose with a TP-sharded model)"
            )
        try:
            dp = dp_size(dp_mesh)
        except ValueError as ex:
            raise Qwen3TTSError(str(ex)) from None
        if divisible % dp != 0:
            raise Qwen3TTSError(
                f"{api}: {what} {divisible} not divisible by the dp mesh "
                f"size {dp} (pad the request list or resize)"
            )

    def _route_stream_inputs(self, text, speaker, instruct, language):
        """Mode routing + validation for streaming (mirrors generate())."""
        mode = self.config.tts_model_type
        if mode == "voice_design":
            if instruct is None:
                raise Qwen3TTSError(
                    "VoiceDesign model requires 'instruct' to describe the voice "
                    "(e.g., 'A cheerful young female voice with high pitch')"
                )
            speaker = None
        elif mode in ("custom_voice", "base"):
            if speaker is None:
                raise Qwen3TTSError(
                    f"{'CustomVoice' if mode == 'custom_voice' else 'Base'} model "
                    "requires 'speaker'. Available speakers: "
                    + ", ".join(self.supported_speakers)
                )
            if speaker.lower() not in self.talker_cfg.speaker_ids:
                raise Qwen3TTSError(
                    f"Speaker '{speaker}' not found. Available speakers: "
                    + ", ".join(self.supported_speakers)
                )
            if mode == "base":
                instruct = None
        return self._prepare_generation_inputs(
            text, language=language, speaker=speaker, instruct=instruct
        )

    # frames of PCM held back while the bidirectional pre-transformer can
    # still see new right-context, and causal-conv left-context frames
    # re-decoded per window (see _decode_audio_window)
    STREAM_LOOKAHEAD_FRAMES = 8
    STREAM_CTX_FRAMES = 32
    # first PCM is emitted as soon as this many frames clear the lookahead
    # (later chunks follow audio_chunk_frames); small on purpose — TTFA
    STREAM_FIRST_AUDIO_FRAMES = 4
    # small vocoder buckets for streaming windows: the first window is
    # ~FIRST_AUDIO+LOOKAHEAD frames and steady-state windows are
    # ~CTX+chunk+LOOKAHEAD, so padding to GEN_BUCKETS' 128 minimum would
    # triple the first-chunk vocoder cost (measured: the 128-bucket window
    # decode dominated round-2's 254 ms TTFA)
    STREAM_BUCKETS = (16, 32, 64) + GEN_BUCKETS

    def _decode_audio_window(
        self, codes: np.ndarray, start_f: int, end_f: int, n_valid: int
    ) -> np.ndarray:
        """Decode PCM for frames [start_f, end_f) from codes[:n_valid].

        Windowed incremental vocoding: the window starts STREAM_CTX_FRAMES
        early so every causal conv is warmed up with real history, and runs
        through frame n_valid so the bidirectional pre-transformer
        (models/vocoder.py:207-251) sees all frames generated so far. The
        causal tail is exact; pre-transformer outputs are approximate only
        within STREAM_LOOKAHEAD_FRAMES of the window end, which the caller
        holds back until more frames arrive.
        """
        dec_cfg = self.tokenizer_config.decoder_config
        s = max(0, start_f - self.STREAM_CTX_FRAMES)
        w = n_valid - s
        bucket = pad_to_bucket(w, self.STREAM_BUCKETS)
        buf = np.zeros((1, bucket, dec_cfg.num_quantizers), np.int32)
        buf[0, :w] = codes[s:n_valid]
        with self._mesh_scope():
            wav, _ = vc_mod.decode(
                self.vocoder_params, dec_cfg, jnp.asarray(buf), jnp.int32(w)
            )
        up = dec_cfg.total_upsample
        # host-side slice (device dynamic slices recompile per offset pair)
        return np.asarray(wav)[0][(start_f - s) * up : (end_f - s) * up]

    def _build_batch_inputs(self, texts, speakers, instructs, language):
        """Per-request validation + prompt construction for batched paths
        (same per-mode rules as generate(), Qwen3.swift:1291-1373)."""
        mode = self.config.tts_model_type
        built = []
        for text, speaker, instruct in zip(texts, speakers, instructs):
            if mode == "voice_design":
                if instruct is None:
                    raise Qwen3TTSError(
                        "VoiceDesign model requires 'instruct' for every text"
                    )
                speaker = None
            elif mode in ("custom_voice", "base"):
                if speaker is None:
                    raise Qwen3TTSError(
                        "CustomVoice/Base model requires 'speaker' for every "
                        "text. Available speakers: "
                        + ", ".join(self.supported_speakers)
                    )
                if speaker.lower() not in self.talker_cfg.speaker_ids:
                    raise Qwen3TTSError(
                        f"Speaker '{speaker}' not found. Available speakers: "
                        + ", ".join(self.supported_speakers)
                    )
                if mode == "base":
                    instruct = None
            embeds, trailing, pad = self._prepare_generation_inputs(
                text, language=language, speaker=speaker, instruct=instruct
            )
            built.append((embeds, trailing, pad))
        return built

    def _decode_audio_list(self, codes_list, n_frames_list) -> list[np.ndarray]:
        """Batched vocoder decode of ragged utterances (shared bucket)."""
        dec_cfg = self.tokenizer_config.decoder_config
        B = len(codes_list)
        n_frames = np.asarray(n_frames_list, np.int32)
        t_vbucket = pad_to_bucket(max(int(n_frames.max()), 1), GEN_BUCKETS)
        buf = np.zeros((B, t_vbucket, dec_cfg.num_quantizers), np.int32)
        for b in range(B):
            buf[b, : n_frames[b]] = codes_list[b][: n_frames[b]]
        with self._mesh_scope():
            wav, lengths = vc_mod.decode(
                self.vocoder_params, dec_cfg, jnp.asarray(buf), jnp.asarray(n_frames)
            )
        wav_np, lengths_np = np.asarray(wav), np.asarray(lengths)
        out = []
        for b in range(B):
            samples = wav_np[b][: n_frames[b] * dec_cfg.total_upsample]
            valid = int(lengths_np[b])
            if 0 < valid < samples.shape[0]:
                samples = samples[:valid]
            out.append(samples)
        return out

    def generate_batch_continuous(
        self,
        texts: list[str],
        speakers: list[str] | None = None,
        instructs: list[str] | None = None,
        language: str = "auto",
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        repetition_penalty: float = 1.05,
        max_tokens: int = 2048,
        seed: int = 0,
        slots: int = 4,
        chunk_frames: int | None = None,
        dp_mesh=None,
    ) -> list[np.ndarray]:
        """Continuous-batching synthesis: N requests over ``slots`` cache
        slots with admission between decode chunks (serving.py).

        Unlike generate_batch (lockstep until the LAST sequence finishes),
        freed slots are immediately refilled from the queue, so throughput
        survives ragged lengths and N can exceed the slot count. Returns one
        waveform per text, in order (empty waveform if a request EOSed on
        its first frame).

        ``dp_mesh``: tp=1 mesh — admit/chunk run shard_map'd over "dp"
        (parallel/dp.py; slots must divide by the dp size, model loaded
        without ``mesh=``).
        """
        from .serving import BatchItem, ContinuousBatcher

        N = len(texts)
        if N == 0:
            return []
        speakers = speakers if speakers is not None else [None] * N
        instructs = instructs if instructs is not None else [None] * N
        if len(speakers) != N or len(instructs) != N:
            raise Qwen3TTSError(
                f"generate_batch_continuous: texts ({N}), speakers "
                f"({len(speakers)}) and instructs ({len(instructs)}) must "
                "have equal lengths"
            )
        if dp_mesh is not None:
            self._validate_dp(dp_mesh, slots, "generate_batch_continuous")
        built = self._build_batch_inputs(texts, speakers, instructs, language)
        caps = [self._effective_max_tokens(t, max_tokens) for t in texts]
        items = [
            BatchItem(
                prefill_embeds=e, trailing=t, max_steps=cap, seed=seed + i
            )
            for i, ((e, t, _), cap) in enumerate(zip(built, caps))
        ]
        batcher = ContinuousBatcher(
            self.talker_params,
            self.cp_params,
            talker_cfg=self.talker_cfg,
            cp_cfg=self.cp_cfg,
            sampling=self._sampling(temperature, top_k, top_p, repetition_penalty),
            tts_pad_embed=built[0][2],
            slots=slots,
            chunk_frames=chunk_frames or self.stream_chunk_frames,
            max_frames=pad_to_bucket(max(caps), GEN_BUCKETS),
            dtype=self.dtype,
            mesh=self.mesh,
            dp_mesh=dp_mesh,
        )
        outs = batcher.run(items)
        if all(o.n_frames == 0 for o in outs):
            raise Qwen3TTSError("No tokens generated")
        audio = self._decode_audio_list(
            [o.codes if o.n_frames else np.zeros((1, 16), np.int32) for o in outs],
            [max(o.n_frames, 1) for o in outs],
        )
        return [
            a if o.n_frames else a[:0] for a, o in zip(audio, outs)
        ]

    def serve(
        self,
        slots: int = 4,
        chunk_frames: int | None = None,
        max_frames: int = 256,
        prompt_bucket: int = 256,
        trailing_bucket: int = 64,
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        repetition_penalty: float = 1.05,
        dp_mesh=None,
        max_queue: int | None = None,
        per_request_sampling: bool = False,
    ) -> "TTSService":
        """Create a long-lived synthesis service over this model.

        Returns a :class:`TTSService` whose thread-safe ``submit(text, ...)``
        returns a Future resolving to the waveform. Requests are
        continuously batched over ``slots`` KV-cache slots
        (serving.Qwen3TTSServer): admissions between decode chunks, one set
        of compiled programs for the life of the service.

        ``max_frames`` caps every request's codec-frame count for the life
        of the service (the compiled shapes depend on it): a request whose
        own token cap exceeds it gets truncated audio, and ``submit`` warns
        when that happens. Size it for the longest text you expect.

        ``dp_mesh``: a tp=1 mesh — the serving programs are shard_map'd
        over "dp" so each device runs the single-chip fast path on its
        slots/dp cache slots (parallel/dp.py); throughput scales with the
        device count. Requires slots divisible by the dp size and a model
        loaded without ``mesh=``.

        ``max_queue``: bound on WAITING requests (in-flight slots don't
        count). A submit beyond it raises serving.ServiceOverloaded —
        backpressure instead of unbounded queue growth; the HTTP front end
        maps it to 429.

        ``per_request_sampling``: sampling parameters become per-slot DATA
        — ``submit`` accepts temperature/top_k/top_p/repetition_penalty
        overrides per request, applied inside the batched sampler
        (ops/sampling.py::sample_token_vec); the scalars above stay the
        defaults. The reference grants per-call sampling on every generate
        (Qwen3.swift:587-616); without this flag the service freezes them
        service-wide (and rejects overrides loudly). Costs the in-kernel
        samplers (they bake scalars), so peak batch throughput is lower —
        enable it for API fidelity, leave it off for benchmark-maximum
        lockstep decoding."""
        if dp_mesh is not None:
            self._validate_dp(dp_mesh, slots, "serve")
        sampling = self._sampling(temperature, top_k, top_p, repetition_penalty)
        if per_request_sampling:
            sampling = sampling._replace(per_request=True)
        return TTSService(
            self,
            slots=slots,
            chunk_frames=chunk_frames or self.stream_chunk_frames,
            max_frames=max_frames,
            prompt_bucket=prompt_bucket,
            trailing_bucket=trailing_bucket,
            sampling=sampling,
            dp_mesh=dp_mesh,
            max_queue=max_queue,
        )

    def generate_stream(
        self,
        text: str,
        speaker: str | None = None,
        instruct: str | None = None,
        language: str = "auto",
        temperature: float = 0.9,
        top_k: int = 50,
        top_p: float = 1.0,
        repetition_penalty: float = 1.05,
        max_tokens: int = 2048,
        seed: int = 0,
        audio_chunk_frames: int | None = None,
    ) -> Iterator[TokenEvent | AudioChunkEvent | InfoEvent | AudioEvent]:
        """Streaming generation (reference Qwen3+Streaming.swift:8-126).

        Yields TokenEvent per first-codebook token WHILE the utterance is
        being generated (tokens are read back between fused device chunks of
        ``stream_chunk_frames``), then one InfoEvent, then one final
        AudioEvent — the reference event contract.

        ``audio_chunk_frames=N`` additionally yields AudioChunkEvent with
        incremental PCM roughly every N frames (N*80 ms of audio) —
        a capability the reference lacks (its README pins "final audio
        only", README.md:140). Chunks concatenate into a coherent waveform;
        the closing AudioEvent still carries the exact full decode.

        Validation and prompt construction run EAGERLY (this is a plain
        function returning a generator, not a generator function): a bad
        speaker/instruct raises Qwen3TTSError at the call site — before any
        consumer thread starts and, in the HTTP server, before the 200
        header leaves the socket.
        """
        if self.vocoder_params is None or self.tokenizer_config is None:
            raise Qwen3TTSError("Speech tokenizer not loaded")
        embeds, trailing, pad = self._route_stream_inputs(
            text, speaker, instruct, language
        )
        sampling = self._sampling(temperature, top_k, top_p, repetition_penalty)
        max_steps = self._effective_max_tokens(text, max_tokens)
        # single-chip audio streaming: prefill + first chunk + first vocoder
        # window fuse into one dispatch (_prefill_first_audio; the cache is
        # allocated in-program, so no device cache buffer in prep). Mesh
        # callers keep the split path (they pass a pre-sharded cache).
        import os as _os

        first_audio = bool(
            audio_chunk_frames
            and self.mesh is None
            and not _os.environ.get("QWEN3TTS_NO_FUSED_TTFA")
        )
        prep = self._prep_run(
            embeds, trailing, pad, max_steps, alloc_cache=not first_audio
        )
        return self._generate_stream_events(
            text, prep, sampling, max_steps, seed, audio_chunk_frames, first_audio
        )

    def _generate_stream_events(
        self, text, prep, sampling, max_steps, seed, audio_chunk_frames,
        first_audio=False,
    ):
        start = time.time()
        n_final = 0
        codes_final: np.ndarray | None = None
        audio_emitted = 0  # frames whose PCM has been yielded
        up = self.tokenizer_config.decoder_config.total_upsample
        for new_tokens, step, codes, done, first_pcm in self._stream_codes(
            prep, sampling, max_steps, seed, first_audio=first_audio
        ):
            for t in new_tokens:
                yield TokenEvent(t)
            if audio_chunk_frames and step > 0:
                upto = step if done else max(step - self.STREAM_LOOKAHEAD_FRAMES, 0)
                if done:
                    need = 1
                elif audio_emitted == 0:
                    # ramped first emit: a few frames of PCM leave as early
                    # as possible (TTFA), then settle into the chunk cadence
                    need = min(audio_chunk_frames, self.STREAM_FIRST_AUDIO_FRAMES)
                else:
                    need = audio_chunk_frames
                if upto - audio_emitted >= need:
                    if first_pcm is not None and upto * up <= first_pcm.shape[0]:
                        # the fused first dispatch already vocoded this
                        # window (frames [0, win_bucket), valid to `step`) —
                        # slice the emit-safe prefix instead of re-decoding
                        pcm = first_pcm[audio_emitted * up : upto * up]
                    else:
                        pcm = self._decode_audio_window(
                            codes, audio_emitted, upto, step
                        )
                    yield AudioChunkEvent(pcm, audio_emitted)
                    audio_emitted = upto
            if done:
                n_final, codes_final = step, codes
        if n_final == 0:
            raise Qwen3TTSError("No tokens generated")

        total = time.time() - start
        prefill_t = self._last_prefill_time
        prompt_tokens = len(self.tokenizer.encode(text)) if self.tokenizer else 0
        yield InfoEvent(
            self._set_info(
                n_final, prompt_tokens, prefill_t, max(total - prefill_t, 1e-9)
            )
        )
        yield AudioEvent(self._decode_audio(codes_final, n_final))

    def generate_stream_async(
        self, *args, max_pending: int = 64, **kwargs
    ) -> "AsyncEventStream":
        """Non-blocking streaming: generation runs on a background thread.

        The reference's ``generateStream`` detaches generation onto its own
        task and hands the caller an async stream
        (Qwen3+Streaming.swift:19-28); the plain ``generate_stream`` here is
        a synchronous generator — events only advance while the caller
        iterates. This wrapper restores the reference's concurrency: a
        daemon thread drives the generator and queues events, so they
        accumulate while the caller does other work. Same arguments and
        event sequence as ``generate_stream``. The queue is bounded at
        ``max_pending`` events: a consumer that stops reading pauses
        generation (backpressure) instead of accumulating a whole
        utterance of PCM in host memory. Call ``.close()`` (or use as a
        context manager) to abandon a stream early — the underlying
        generator is closed on the producer thread, so no further device
        chunks are dispatched.
        """
        return AsyncEventStream(
            self.generate_stream(*args, **kwargs), maxsize=max_pending
        )

    # ------------------------------------------------------------------
    # Speaker embedding extraction (reference Qwen3.swift:222-249)
    # ------------------------------------------------------------------

    def extract_speaker_embedding(
        self, audio: np.ndarray, sample_rate: int = 24000
    ) -> jnp.ndarray:
        if sample_rate != 24000:
            raise Qwen3TTSError(
                "Only 24kHz audio is supported for speaker embedding extraction"
            )
        if self.speaker_encoder_params is None:
            raise Qwen3TTSError("Speaker encoder not available for this model")
        return spk_mod.extract_embedding(
            self.speaker_encoder_params,
            self.config.speaker_encoder_config,
            jnp.asarray(np.asarray(audio, np.float32)),
        )


class AsyncEventStream:
    """Iterator over events produced by a background generation thread.

    Produced by :meth:`Qwen3TTSModel.generate_stream_async`. Events queue
    up as the device produces them, bounded at ``maxsize``: when the
    consumer lags ``maxsize`` events behind, the producer blocks before
    advancing the generator, so a stalled client pauses device work
    instead of accumulating a whole utterance of PCM per connection.
    Exceptions from the generation thread re-raise on the consumer at the
    point of iteration. ``pending()`` reports how many events are queued.
    ``close()`` unblocks the producer and closes the underlying generator
    on the producer thread (GeneratorExit at its current yield point), so
    an abandoned stream stops issuing device dispatches within one event.
    """

    _SENTINEL = object()

    def __init__(self, gen, maxsize: int = 64):
        import queue
        import threading

        self._queue_mod = queue
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, maxsize))
        self._stop = threading.Event()
        self._exc: BaseException | None = None

        def _put_or_stop(ev) -> bool:
            """Blocking put with close()-wakeup; False if the stream closed."""
            while not self._stop.is_set():
                try:
                    self._q.put(ev, timeout=0.05)
                    return True
                except queue.Full:
                    continue
            return False

        def run():
            try:
                for ev in gen:
                    if not _put_or_stop(ev):
                        break
            except BaseException as ex:  # re-raised on the consumer side
                self._exc = ex
            finally:
                # Close the generator HERE, on the producer thread: this
                # raises GeneratorExit at its current yield, so an
                # abandoned generate_stream stops dispatching device work
                # now rather than at garbage collection.
                try:
                    gen.close()
                except Exception:
                    pass
                # The sentinel must always land so a racing consumer
                # terminates; after close() the consumer may be gone, so
                # make room rather than block forever.
                while True:
                    try:
                        self._q.put(self._SENTINEL, timeout=0.05)
                        break
                    except queue.Full:
                        if self._stop.is_set():
                            try:
                                self._q.get_nowait()
                            except queue.Empty:
                                pass

        self._thread = threading.Thread(
            target=run, name="qwen3tts-stream", daemon=True
        )
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        ev = self._q.get()
        if ev is self._SENTINEL:
            self._thread.join()
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return ev

    def pending(self) -> int:
        """Events already produced but not yet consumed."""
        return self._q.qsize()

    def close(self):
        """Abandon the stream: wake a blocked producer and stop generation."""
        self._stop.set()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class TTSService:
    """Long-lived synthesis service: text in, Future[waveform] out.

    Thin model-aware layer over :class:`serving.Qwen3TTSServer`: builds the
    per-request prompt tensors (same mode rules as ``generate``), enqueues
    them for continuous batching, and vocodes harvested codes in the
    completion callback. Create via ``Qwen3TTSModel.serve()``; use as a
    context manager or call ``close()``.
    """

    def __init__(
        self, model: Qwen3TTSModel, *, slots, chunk_frames, max_frames,
        prompt_bucket, trailing_bucket, sampling, dp_mesh=None, max_queue=None,
    ):
        self._model = model
        self._kw = dict(
            slots=slots, chunk_frames=chunk_frames, max_frames=max_frames,
            prompt_bucket=prompt_bucket, trailing_bucket=trailing_bucket,
            dp_mesh=dp_mesh, max_queue=max_queue,
        )
        import threading

        self._sampling = sampling
        self._server = None  # created on first submit (needs a pad embed)
        self._server_lock = threading.Lock()

    @property
    def model(self) -> Qwen3TTSModel:
        """The underlying model (e.g. for per-request streaming paths)."""
        return self._model

    def _ensure_server(self, pad):
        if self._server is not None:
            return
        # double-checked: submit() is called from ThreadingHTTPServer
        # threads, and two concurrent first submits must not construct
        # two servers (each owns device KV caches + a worker thread)
        from .serving import Qwen3TTSServer

        m = self._model
        with self._server_lock:
            if self._server is None:
                self._server = Qwen3TTSServer(
                    m.talker_params,
                    m.cp_params,
                    talker_cfg=m.talker_cfg,
                    cp_cfg=m.cp_cfg,
                    sampling=self._sampling,
                    tts_pad_embed=pad,
                    dtype=m.dtype,
                    mesh=m.mesh,
                    kv_quant=m.kv_quant,
                    **self._kw,
                )

    def _capped_tokens(self, text: str, max_tokens: int) -> int:
        cap = self._model._effective_max_tokens(text, max_tokens)
        if cap > self._kw["max_frames"]:
            import warnings

            warnings.warn(
                f"request would allow {cap} frames but the service was "
                f"created with max_frames={self._kw['max_frames']}; long "
                "texts will be truncated to that many codec frames. Create "
                "the service with a larger max_frames to avoid this.",
                stacklevel=3,
            )
        return cap

    def submit(
        self,
        text: str,
        speaker: str | None = None,
        instruct: str | None = None,
        language: str = "auto",
        seed: int = 0,
        max_tokens: int = 2048,
        temperature: float | None = None,
        top_k: int | None = None,
        top_p: float | None = None,
        repetition_penalty: float | None = None,
    ):
        """Enqueue one synthesis request; returns Future[np.ndarray].

        The four sampling overrides apply to THIS request only and require
        a service created with ``serve(per_request_sampling=True)`` —
        otherwise they raise Qwen3TTSError (mirrors the reference's
        per-call sampling surface, Qwen3.swift:587-616)."""
        from concurrent.futures import Future

        from .serving import BatchItem, Qwen3TTSServer

        m = self._model
        (embeds, trailing, pad), = m._build_batch_inputs(
            [text], [speaker], [instruct], language
        )
        self._ensure_server(pad)
        cap = self._capped_tokens(text, max_tokens)
        try:
            inner = self._server.submit(
                BatchItem(
                    prefill_embeds=embeds, trailing=trailing,
                    max_steps=cap, seed=seed,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    repetition_penalty=repetition_penalty,
                )
            )
        except ValueError as e:
            # sampling overrides on a non-per-request service: a typed API
            # error, not a server internal
            raise Qwen3TTSError(str(e)) from None

        class _ServiceFuture(Future):
            # cancel() reaches the still-queued server item too, so a
            # cancelled request costs zero device work (serving.py honors
            # cancel at admission time)
            def cancel(self):
                inner.cancel()
                return super().cancel()

        outer: Future = _ServiceFuture()

        def _vocode(f):
            if f.cancelled():
                outer.cancel()
                return
            if not outer.set_running_or_notify_cancel():
                return
            try:
                out = f.result()
                if out.n_frames == 0:
                    outer.set_result(np.zeros((0,), np.float32))
                else:
                    wav = m._decode_audio_list([out.codes], [out.n_frames])[0]
                    outer.set_result(np.asarray(wav, np.float32))
            except BaseException as ex:  # propagate to the caller
                outer.set_exception(ex)

        inner.add_done_callback(_vocode)
        return outer

    def submit_stream(
        self,
        text: str,
        speaker: str | None = None,
        instruct: str | None = None,
        language: str = "auto",
        seed: int = 0,
        max_tokens: int = 2048,
        audio_chunk_frames: int = 8,
        temperature: float | None = None,
        top_k: int | None = None,
        top_p: float | None = None,
        repetition_penalty: float | None = None,
        final_audio: bool = False,
    ) -> Iterator[TokenEvent | AudioChunkEvent | InfoEvent | AudioEvent]:
        """Streamed synthesis THROUGH the continuous batcher: the request
        occupies one server slot, decoding in lockstep with every other
        in-flight request, while this generator yields TokenEvent /
        AudioChunkEvent as the slot's frames land (round-4 verdict #1 —
        previously each HTTP stream ran a private single-stream decode
        around the batcher, so N streaming clients contended for the chip
        with no slot sharing).

        Event contract matches ``generate_stream`` (Qwen3+Streaming.swift:
        8-126): TokenEvent per codebook-0 token, AudioChunkEvent roughly
        every ``audio_chunk_frames`` frames (chunks tile the utterance:
        windowed incremental vocoding via ``_decode_audio_window``), one
        closing InfoEvent. The final full-utterance AudioEvent is opt-in
        (``final_audio=True``) — the chunks already cover every frame, and
        a serving front end that only forwards PCM chunks shouldn't pay a
        second full vocoder pass.

        The worker publishes coalesced progress snapshots between decode
        chunks (serving.SlotProgress) — a slow consumer never queues device
        memory and never blocks the server. Abandoning the generator
        (``.close()`` / GeneratorExit) cancels the request: the slot is
        freed within one decode chunk.

        Validation and prompt construction run EAGERLY (plain function
        returning a generator): a bad speaker/instruct raises here, before
        any 200 header leaves an HTTP socket."""
        from .serving import BatchItem

        m = self._model
        if m.vocoder_params is None or m.tokenizer_config is None:
            raise Qwen3TTSError("Speech tokenizer not loaded")
        (embeds, trailing, pad), = m._build_batch_inputs(
            [text], [speaker], [instruct], language
        )
        self._ensure_server(pad)
        cap = self._capped_tokens(text, max_tokens)
        try:
            fut, prog = self._server.submit_stream(
                BatchItem(
                    prefill_embeds=embeds, trailing=trailing,
                    max_steps=cap, seed=seed,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    repetition_penalty=repetition_penalty,
                )
            )
        except ValueError as e:
            raise Qwen3TTSError(str(e)) from None
        prompt_tokens = len(m.tokenizer.encode(text)) if m.tokenizer else 0
        return self._stream_slot_events(
            prog, prompt_tokens, audio_chunk_frames, final_audio
        )

    def _stream_slot_events(
        self, prog, prompt_tokens, audio_chunk_frames, final_audio
    ):
        m = self._model
        start = time.time()
        seen = 0  # frames whose TokenEvents have been yielded
        audio_emitted = 0  # frames whose PCM has been yielded
        codes, n = None, 0
        try:
            while True:
                codes, n, done = prog.wait_beyond(seen, timeout=600.0)
                for t in codes[seen:n, 0]:
                    yield TokenEvent(int(t))
                seen = n
                if audio_chunk_frames and n > 0:
                    upto = (
                        n if done
                        else max(n - m.STREAM_LOOKAHEAD_FRAMES, 0)
                    )
                    if done:
                        need = 1
                    elif audio_emitted == 0:
                        need = min(
                            audio_chunk_frames, m.STREAM_FIRST_AUDIO_FRAMES
                        )
                    else:
                        need = audio_chunk_frames
                    if upto - audio_emitted >= need:
                        pcm = m._decode_audio_window(
                            codes, audio_emitted, upto, n
                        )
                        yield AudioChunkEvent(pcm, audio_emitted)
                        audio_emitted = upto
                if done:
                    break
            if n == 0:
                raise Qwen3TTSError("No tokens generated")
            total = max(time.time() - start, 1e-9)
            yield InfoEvent(
                GenerationInfo(
                    prompt_token_count=prompt_tokens,
                    generation_token_count=n,
                    prefill_time=0.0,  # folded into the shared admit chunk
                    generate_time=total,
                    tokens_per_second=n / total,
                    peak_memory_usage=_device_peak_memory_gb(),
                )
            )
            if final_audio:
                yield AudioEvent(m._decode_audio_list([codes], [n])[0])
        finally:
            # abandoned OR finished: either way the slot must not keep
            # decoding for a consumer that's gone (harvested slots ignore it)
            prog.cancel()

    def close(self, wait: bool = True):
        if self._server is not None:
            self._server.close(wait=wait)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
