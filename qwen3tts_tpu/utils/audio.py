"""WAV audio I/O (24 kHz mono float32 <-> RIFF PCM).

The reference uses AVFoundation (Core/AudioUtils.swift:14-64) plus a raw
RIFF int16 writer in the CLI (Qwen3TTSDemo/main.swift:134-165). Here: a
dependency-free numpy RIFF codec, with an optional C++ fast path
(qwen3tts_tpu.native) used when the extension is built.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_bytes(samples: np.ndarray, sample_rate: int = 24000) -> bytes:
    """Mono float32 samples in [-1, 1] -> 16-bit PCM RIFF bytes."""
    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def wav_stream_header(sample_rate: int = 24000) -> bytes:
    """RIFF header for a 16-bit mono PCM stream of unknown length.

    Chunk sizes are 0xFFFFFFFF (the conventional "open-ended" marker for
    live streams); append raw PCM16 frames after it. Players and browsers
    accept this for progressive playback; re-mux for archival use.
    """
    return (
        b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", 0xFFFFFFFF)
    )


def pcm16_bytes(samples: np.ndarray) -> bytes:
    """Mono float32 samples in [-1, 1] -> raw little-endian PCM16 bytes."""
    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    return (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()


def save_wav(path: str, samples: np.ndarray, sample_rate: int = 24000) -> None:
    """Write mono float32 samples in [-1, 1] as 16-bit PCM RIFF."""
    with open(path, "wb") as f:
        f.write(wav_bytes(samples, sample_rate))


def load_wav(path: str) -> tuple[int, np.ndarray]:
    """Read a RIFF WAV; returns (sample_rate, float32 mono samples in [-1,1]).

    Supports PCM16/PCM24/PCM32 and IEEE float32, any channel count
    (downmixed to mono by averaging), walking chunks per the RIFF spec.
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 3 and bits == 32:
        x = np.frombuffer(raw, "<f4").astype(np.float32)
    elif audio_format == 1 and bits == 16:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif audio_format == 1 and bits == 24:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        x = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / (1 << 23)
    else:
        raise ValueError(f"{path}: unsupported format {audio_format}/{bits}bit")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return sample_rate, x
