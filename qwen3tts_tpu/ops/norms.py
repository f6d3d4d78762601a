"""Normalization and activation primitives.

All norms accumulate in float32 and cast back to the input dtype, matching
MLX's fused kernels used by the reference (RMSNorm / LayerNorm via MLXNN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray | None, eps: float):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def elu(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    # reference SpeechTokenizerEncoder.swift:1075-1077
    return jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approximate GELU (reference SpeechTokenizerEncoder.swift:1080-1082)."""
    xf = x.astype(jnp.float32)
    out = xf * 0.5 * (1.0 + jnp.tanh(0.7978845608 * (xf + 0.044715 * xf**3)))
    return out.astype(x.dtype)


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-9):
    """SnakeBeta activation: x + (1/(e^beta + eps)) * sin^2(x * e^alpha).

    x: [..., C] channel-last; alpha/beta: [C] stored as log values
    (reference SpeechTokenizer.swift:232-254, which uses channel-first; we
    keep NWC, the native JAX/TPU conv layout).
    """
    a = jnp.exp(alpha.astype(jnp.float32))
    b = jnp.exp(beta.astype(jnp.float32))
    xf = x.astype(jnp.float32)
    s = jnp.sin(xf * a)
    return (xf + (1.0 / (b + eps)) * (s * s)).astype(x.dtype)
