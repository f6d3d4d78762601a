"""Rotary position embeddings: standard RoPE and interleaved MRoPE.

TPU-first design notes
----------------------
The reference computes cos/sin tables per forward call on the fly
(reference: Sources/Qwen3TTS/Models/Talker.swift:23-121,
CodePredictor.swift:22-60). Here everything is a pure function of position
ids so it fuses into the jitted decode step; frequencies are computed in
float32 and the resulting cos/sin are cast to the activation dtype, matching
the reference numerics (Talker.swift:103-117).

For Qwen3-TTS the three MRoPE position streams (T/H/W) are always identical
(positions are broadcast 2D->3D, Talker.swift:93-96), in which case the
interleaved combination is exactly standard RoPE. We implement the general
interleave for parity/tests and use it unconditionally — with identical
streams XLA folds the selects away.
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np


def inv_freq(head_dim: int, base: float) -> np.ndarray:
    """1 / base**(2i/d) for i in [0, d/2), float32, computed host-side once."""
    idx = np.arange(0, head_dim, 2, dtype=np.float32)
    return (1.0 / (base ** (idx / head_dim))).astype(np.float32)


def mrope_interleave_masks(head_dim_half: int, mrope_section: tuple[int, ...]):
    """Boolean masks selecting H and W frequency slots.

    Pattern (reference Talker.swift:49-82): position ``i`` takes the H stream
    when ``i % 3 == 1 and i < 3*section[1]``, the W stream when
    ``i % 3 == 2 and i < 3*section[2]``, otherwise the T stream.
    """
    i = np.arange(head_dim_half)
    h_mask = (i % 3 == 1) & (i < 3 * mrope_section[1])
    w_mask = (i % 3 == 2) & (i < 3 * mrope_section[2])
    return h_mask, w_mask


def mrope_cos_sin(
    position_ids: jnp.ndarray,
    head_dim: int,
    base: float,
    mrope_section: tuple[int, ...],
    dtype=jnp.bfloat16,
):
    """Compute interleaved-MRoPE cos/sin tables.

    Args:
      position_ids: [3, B, T] (T/H/W streams) or [B, T] (broadcast to 3).
      head_dim: per-head dimension (cos/sin are over the full head_dim).
    Returns:
      (cos, sin) each [B, T, head_dim] in ``dtype``.
    """
    if position_ids.ndim == 2:
        position_ids = jnp.broadcast_to(position_ids[None], (3,) + position_ids.shape)
    inv = jnp.asarray(inv_freq(head_dim, base))  # [d/2]
    pos = position_ids.astype(jnp.float32)  # [3, B, T]
    freqs = pos[..., None] * inv  # [3, B, T, d/2]

    h_mask, w_mask = mrope_interleave_masks(head_dim // 2, mrope_section)
    combined = jnp.where(jnp.asarray(h_mask), freqs[1], freqs[0])
    combined = jnp.where(jnp.asarray(w_mask), freqs[2], combined)  # [B, T, d/2]

    emb = jnp.concatenate([combined, combined], axis=-1)  # [B, T, d]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rope_cos_sin(position_ids: jnp.ndarray, head_dim: int, base: float, dtype=jnp.bfloat16):
    """Standard RoPE cos/sin (code predictor / Mimi encoder path).

    position_ids: [B, T] -> (cos, sin) each [B, T, head_dim].
    """
    inv = jnp.asarray(inv_freq(head_dim, base))
    freqs = position_ids.astype(jnp.float32)[..., None] * inv  # [B, T, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Apply rotary embedding to q/k of shape [B, H, T, D]; cos/sin [B, T, D]."""
    cos = cos[:, None]  # [B, 1, T, D]
    sin = sin[:, None]
    q_rot = q * cos + rotate_half(q) * sin
    k_rot = k * cos + rotate_half(k) * sin
    return q_rot, k_rot
