"""ECAPA-TDNN speaker encoder + mel-spectrogram DSP for voice cloning.

TPU-native re-design of the reference speaker encoder
(reference: Sources/Qwen3TTS/Models/SpeakerEncoder.swift:45-550):
3 s of 24 kHz reference audio -> 1024-d x-vector.

Mel pipeline: n_fft 1024, 128 mels, hop 256, fmax 12 kHz, log-clamped; then
TDNN(k5) -> 3 SE-Res2Net blocks (scale 8, dilations 2/3/4) -> MFA concat ->
attentive-statistics pooling (mean||std attention) -> 1x1 conv fc.

Everything is NWC and compiles to one XLA program; the STFT uses a strided
frame gather + rFFT instead of the reference's per-frame Python loop
(SpeakerEncoder.swift:465-490).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SpeakerEncoderConfig
from ..ops.conv import conv1d

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Mel spectrogram DSP (reference SpeakerEncoder.swift:410-550)
# ---------------------------------------------------------------------------


def hann_window(size: int) -> np.ndarray:
    n = np.arange(size, dtype=np.float32)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / (size - 1)))).astype(np.float32)


def mel_filterbank(
    n_fft: int, num_mels: int, sample_rate: int, f_min: float, f_max: float
) -> np.ndarray:
    """Triangular mel filterbank [n_fft//2+1, num_mels] with integer-bin
    edges, matching the reference exactly (SpeakerEncoder.swift:493-550)."""

    def hz_to_mel(hz):
        return 2595.0 * np.log10(1.0 + hz / 700.0)

    def mel_to_hz(mel):
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)

    mel_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), num_mels + 2)
    bins = np.floor((n_fft + 1) * mel_to_hz(mel_pts) / sample_rate).astype(int)
    num_freqs = n_fft // 2 + 1
    fb = np.zeros((num_freqs, num_mels), np.float32)
    for m in range(num_mels):
        left, center, right = bins[m], bins[m + 1], bins[m + 2]
        for k in range(left, center):
            if k < num_freqs and center > left:
                fb[k, m] = (k - left) / (center - left)
        for k in range(center, right):
            if k < num_freqs and right > center:
                fb[k, m] = (right - k) / (right - center)
    return fb


@partial(jax.jit, static_argnames=("n_fft", "num_mels", "sample_rate", "hop", "f_min", "f_max"))
def mel_spectrogram(
    audio: jnp.ndarray,
    *,
    n_fft: int = 1024,
    num_mels: int = 128,
    sample_rate: int = 24000,
    hop: int = 256,
    f_min: float = 0.0,
    f_max: float = 12000.0,
) -> jnp.ndarray:
    """audio [samples] or [B, samples] -> log-mel [B, time, mels]."""
    if audio.ndim == 1:
        audio = audio[None]
    x = audio.astype(jnp.float32)
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)))
    num_frames = (x.shape[1] - n_fft) // hop + 1
    # strided frame extraction: [B, frames, n_fft]
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(n_fft)[None]
    frames = x[:, idx] * jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(frames, axis=-1)  # [B, frames, n_fft//2+1]
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(mel_filterbank(n_fft, num_mels, sample_rate, f_min, f_max))
    mel = power @ fb  # [B, frames, mels]
    return jnp.log(jnp.maximum(mel, 1e-10))


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _reflect_pad_time(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


def tdnn_block(p: Params, x: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """Conv1d with reflect 'same' padding + ReLU (reference :45-70). x: [B,T,C]."""
    k = p["w"].shape[0]
    pad = (k - 1) * dilation // 2
    h = conv1d(_reflect_pad_time(x, pad), p["w"], p["b"], dilation=dilation)
    return jax.nn.relu(h)


def res2net_block(p: Params, x: jnp.ndarray, scale: int, dilation: int) -> jnp.ndarray:
    """Multi-scale residual conv block (reference :75-117). x: [B,T,C]."""
    chunk = x.shape[-1] // scale
    outs = []
    part = None
    for i in range(scale):
        piece = x[..., i * chunk : (i + 1) * chunk]
        if i == 0:
            part = piece
        elif i == 1:
            part = tdnn_block(p["blocks"][i - 1], piece, dilation)
        else:
            part = tdnn_block(p["blocks"][i - 1], piece + part, dilation)
        outs.append(part)
    return jnp.concatenate(outs, axis=-1)


def se_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Squeeze-excitation channel attention (reference :122-156). x: [B,T,C]."""
    s = x.mean(axis=1, keepdims=True)  # [B, 1, C]
    s = jax.nn.relu(conv1d(s, p["conv1"]["w"], p["conv1"]["b"]))
    s = jax.nn.sigmoid(conv1d(s, p["conv2"]["w"], p["conv2"]["b"]))
    return x * s


def se_res2net_block(p: Params, x: jnp.ndarray, scale: int, dilation: int) -> jnp.ndarray:
    h = tdnn_block(p["tdnn1"], x, 1)
    h = res2net_block(p["res2net_block"], h, scale, dilation)
    h = tdnn_block(p["tdnn2"], h, 1)
    h = se_block(p["se_block"], h)
    return h + x


def attentive_stats_pooling(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Attention-weighted mean||std pooling (reference :217-273). x: [B,T,C]."""
    eps = 1e-12
    mean = x.mean(axis=1, keepdims=True)
    std = jnp.sqrt(x.var(axis=1, keepdims=True) + eps)
    T = x.shape[1]
    attn = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], axis=-1
    )
    attn = tdnn_block(p["tdnn"], attn, 1)
    attn = jnp.tanh(attn)
    attn = conv1d(attn, p["conv"]["w"], p["conv"]["b"])
    attn = jax.nn.softmax(attn, axis=1)  # over time
    w_mean = (attn * x).sum(axis=1, keepdims=True)
    w_var = (attn * (x - w_mean) ** 2).sum(axis=1, keepdims=True)
    w_std = jnp.sqrt(jnp.clip(w_var, eps, None))
    return jnp.concatenate([w_mean, w_std], axis=-1)  # [B, 1, 2C]


def forward(params: Params, cfg: SpeakerEncoderConfig, mels: jnp.ndarray) -> jnp.ndarray:
    """mels [B, T, mel_dim] -> x-vector [B, enc_dim] (reference :364-394)."""
    scale = cfg.enc_res2net_scale
    h0 = tdnn_block(params["blocks"][0], mels, cfg.enc_dilations[0])
    h1 = se_res2net_block(params["blocks"][1], h0, scale, cfg.enc_dilations[1])
    h2 = se_res2net_block(params["blocks"][2], h1, scale, cfg.enc_dilations[2])
    h3 = se_res2net_block(params["blocks"][3], h2, scale, cfg.enc_dilations[3])
    h = jnp.concatenate([h1, h2, h3], axis=-1)
    h = tdnn_block(params["mfa"], h, cfg.enc_dilations[4])
    h = attentive_stats_pooling(params["asp"], h)
    h = conv1d(h, params["fc"]["w"], params["fc"]["b"])  # [B, 1, enc_dim]
    return h[:, 0]


@partial(jax.jit, static_argnames=("cfg",))
def extract_embedding(params: Params, cfg: SpeakerEncoderConfig, audio: jnp.ndarray):
    """audio [samples] @24kHz -> x-vector [1, enc_dim] (reference Qwen3.swift:222-249)."""
    mels = mel_spectrogram(
        audio,
        n_fft=1024,
        num_mels=cfg.mel_dim,
        sample_rate=cfg.sample_rate,
        hop=256,
        f_min=0.0,
        f_max=12000.0,
    )
    return forward(params, cfg, mels)


# ---------------------------------------------------------------------------
# Synthetic init
# ---------------------------------------------------------------------------


def _conv(key, k, c_in, c_out, dtype):
    w = jax.random.normal(key, (k, c_in, c_out), jnp.float32) / np.sqrt(c_in * k)
    return {"w": w.astype(dtype), "b": jnp.zeros((c_out,), dtype)}


def init_speaker_encoder_params(key, cfg: SpeakerEncoderConfig, dtype=jnp.float32) -> Params:
    ks = list(jax.random.split(key, 64))
    kit = iter(ks)
    ch, ksz = cfg.enc_channels, cfg.enc_kernel_sizes
    scale = cfg.enc_res2net_scale

    def se_res2net(c_in, c_out, k):
        return {
            "tdnn1": _conv(next(kit), 1, c_in, c_out, dtype),
            "res2net_block": {
                "blocks": [
                    _conv(next(kit), k, c_out // scale, c_out // scale, dtype)
                    for _ in range(scale - 1)
                ]
            },
            "tdnn2": _conv(next(kit), 1, c_out, c_out, dtype),
            "se_block": {
                "conv1": _conv(next(kit), 1, c_out, cfg.enc_se_channels, dtype),
                "conv2": _conv(next(kit), 1, cfg.enc_se_channels, c_out, dtype),
            },
        }

    mfa_in = ch[1] + ch[2] + ch[3]
    return {
        "blocks": [
            _conv(next(kit), ksz[0], cfg.mel_dim, ch[0], dtype),
            se_res2net(ch[0], ch[1], ksz[1]),
            se_res2net(ch[1], ch[2], ksz[2]),
            se_res2net(ch[2], ch[3], ksz[3]),
        ],
        "mfa": _conv(next(kit), ksz[4], mfa_in, ch[4], dtype),
        "asp": {
            "tdnn": _conv(next(kit), 1, ch[4] * 3, cfg.enc_attention_channels, dtype),
            "conv": _conv(next(kit), 1, cfg.enc_attention_channels, ch[4], dtype),
        },
        "fc": _conv(next(kit), 1, ch[4] * 2, cfg.enc_dim, dtype),
    }
