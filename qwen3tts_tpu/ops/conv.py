"""1-D convolution primitives in NWC layout (the native TPU/XLA layout).

The reference keeps NCT activations and transposes around every MLX conv
call (e.g. Sources/Qwen3TTS/Models/SpeechTokenizer.swift:293-305); here
activations stay channel-last end to end so XLA lowers straight to MXU
convolutions without layout shuffles.

Kernel layouts:
  conv1d:            [W, I, O]   (PyTorch Conv1d stores [O, I, W])
  conv1d_transpose:  [W, O, I]   (PyTorch ConvTranspose1d stores [I, O, W])
The checkpoint loader performs those transposes once at load time. Parity
with torch is pinned by tests (tests/test_conv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DN = ("NWC", "WIO", "NWC")


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    padding=((0, 0),),
) -> jnp.ndarray:
    """x: [B, T, C_in], w: [W, C_in/groups, C_out] -> [B, T', C_out]."""
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def causal_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Left-padded causal conv (reference SpeechTokenizer.swift:259-306)."""
    k = w.shape[0]
    pad = (k - 1) * dilation
    return conv1d(x, w, b, dilation=dilation, groups=groups, padding=((pad, 0),))


def conv1d_transpose(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 1,
) -> jnp.ndarray:
    """PyTorch-semantics ConvTranspose1d (padding=0).

    x: [B, T, C_in], w: [W, C_out, C_in] -> [B, (T-1)*stride + W, C_out].
    Implemented as an input-dilated convolution with the spatially-flipped
    kernel — the standard XLA lowering.
    """
    k = w.shape[0]
    # flip spatial axis and move to [W, I, O]
    w_flip = jnp.flip(w, axis=0).transpose(0, 2, 1)
    y = jax.lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1,),
        padding=((k - 1, k - 1),),
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def causal_conv1d_transpose(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None, *, stride: int = 1
) -> jnp.ndarray:
    """Transpose conv trimmed to a causal output of exactly T*stride samples
    (reference SpeechTokenizer.swift:311-354: trim kernel-stride from the
    right)."""
    k = w.shape[0]
    y = conv1d_transpose(x, w, b, stride=stride)
    trim = k - stride
    if trim > 0:
        y = y[:, :-trim]
    return y


def streamable_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None,
    *,
    stride: int = 1,
    dilation: int = 1,
    causal: bool = True,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """Mimi-style conv with exact-frame extra padding
    (reference SpeechTokenizerEncoder.swift:114-187).

    Pads so the strided conv consumes the input exactly: left pad
    (k_eff - stride) for causality plus right "extra" pad to complete the
    final frame. ``pad_mode`` 'edge' replicates the boundary sample.
    """
    k = w.shape[0]
    k_eff = (k - 1) * dilation + 1
    length = x.shape[1]
    padding_total = k_eff - stride
    nframes = max(length + padding_total - k_eff, 0) / stride + 1.0
    import math

    ideal = (math.ceil(nframes) - 1) * stride + k_eff - padding_total
    extra = max(0, ideal - length)
    if causal:
        left, right = padding_total, extra
    else:
        right = padding_total // 2 + extra
        left = padding_total - padding_total // 2
    mode = "edge" if pad_mode == "edge" else "constant"
    x = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode=mode)
    return conv1d(x, w, b, stride=stride, dilation=dilation)
