"""Pallas fused decode-attention kernel vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from qwen3tts_tpu.ops import attention as pa
from qwen3tts_tpu.models.talker import _attend


def _xla_reference(q, k_new, v_new, k_cache, v_cache, pos, scale):
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new, (0, 0, pos, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new, (0, 0, pos, 0))
    T = k_cache.shape[2]
    mask = (jnp.arange(T) <= pos)[None, None, :]
    out = _attend(q, k_cache, v_cache, mask, scale)
    return out, k_cache, v_cache


@pytest.mark.parametrize("pos", [0, 5, 127, 128, 200])
def test_kernel_matches_xla(pos):
    Hq, Hkv, D, T = 4, 2, 64, 256
    rs = np.random.RandomState(pos)
    q = jnp.asarray(rs.randn(1, Hq, 1, D).astype(np.float32))
    k_new = jnp.asarray(rs.randn(1, Hkv, 1, D).astype(np.float32))
    v_new = jnp.asarray(rs.randn(1, Hkv, 1, D).astype(np.float32))
    k_cache = jnp.asarray(rs.randn(1, Hkv, T, D).astype(np.float32) * 0.5)
    v_cache = jnp.asarray(rs.randn(1, Hkv, T, D).astype(np.float32) * 0.5)
    scale = D**-0.5

    want, k_want, v_want = _xla_reference(
        q, k_new, v_new, k_cache, v_cache, pos, scale
    )
    got = pa.decode_attention_inner(
        q, k_want, v_want, jnp.int32(pos), scale, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_kernel_ignores_garbage_beyond_pos():
    """Slots beyond pos must not affect the output (prefix-only streaming)."""
    Hq, Hkv, D, T = 2, 1, 32, 128
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(1, Hq, 1, D).astype(np.float32))
    k_new = jnp.asarray(rs.randn(1, Hkv, 1, D).astype(np.float32))
    v_new = jnp.asarray(rs.randn(1, Hkv, 1, D).astype(np.float32))
    base_k = rs.randn(1, Hkv, T, D).astype(np.float32)
    base_v = rs.randn(1, Hkv, T, D).astype(np.float32)
    pos = 10
    base_k[:, :, pos] = np.asarray(k_new)[:, :, 0]
    base_v[:, :, pos] = np.asarray(v_new)[:, :, 0]
    poisoned_k = base_k.copy()
    poisoned_k[:, :, pos + 1 :] = 1e6
    poisoned_v = base_v.copy()
    poisoned_v[:, :, pos + 1 :] = -1e6

    out1 = pa.decode_attention_inner(
        q, jnp.asarray(base_k), jnp.asarray(base_v),
        jnp.int32(pos), D**-0.5, interpret=True,
    )
    out2 = pa.decode_attention_inner(
        q, jnp.asarray(poisoned_k), jnp.asarray(poisoned_v),
        jnp.int32(pos), D**-0.5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


@pytest.mark.parametrize("pos", [0, 5, 511, 512, 900])
def test_v2_stripe_kernel_matches_xla(pos):
    """Round-2 all-heads stripe kernel (BLOCK_T2=512) vs the XLA path."""
    Hq, Hkv, D, T = 4, 2, 64, 1024
    rs = np.random.RandomState(pos)
    q = jnp.asarray(rs.randn(1, Hq, 1, D).astype(np.float32))
    k_cache = jnp.asarray(rs.randn(1, Hkv, T, D).astype(np.float32) * 0.5)
    v_cache = jnp.asarray(rs.randn(1, Hkv, T, D).astype(np.float32) * 0.5)
    scale = D**-0.5

    mask = (jnp.arange(T) <= pos)[None, None, :]
    want = _attend(q, k_cache, v_cache, mask, scale)
    got = pa.decode_attention_v2_inner(
        q, k_cache, v_cache, jnp.int32(pos), scale, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_v2_layer_indexed_cache():
    """v2 with the scan-carried [L, 1, Hkv, T, D] layout selects its layer."""
    Hq, Hkv, D, T, L = 4, 2, 32, 512, 3
    rs = np.random.RandomState(7)
    q = jnp.asarray(rs.randn(1, Hq, 1, D).astype(np.float32))
    k = jnp.asarray(rs.randn(L, 1, Hkv, T, D).astype(np.float32) * 0.5)
    v = jnp.asarray(rs.randn(L, 1, Hkv, T, D).astype(np.float32) * 0.5)
    pos, scale = 100, D**-0.5
    mask = (jnp.arange(T) <= pos)[None, None, :]
    for lyr in range(L):
        want = _attend(q, k[lyr], v[lyr], mask, scale)
        got = pa.decode_attention_v2_inner(
            q, k, v, jnp.int32(pos), scale, layer=jnp.int32(lyr), interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
