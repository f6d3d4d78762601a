"""Parity tests: our NWC conv primitives vs torch's Conv1d/ConvTranspose1d.

These pin the weight-layout conversion used by the checkpoint loader:
  torch Conv1d [O, I, W]          -> ours [W, I, O]
  torch ConvTranspose1d [I, O, W] -> ours [W, O, I]
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from qwen3tts_tpu.ops import conv


def _rand(*shape):
    return np.random.RandomState(sum(shape)).randn(*shape).astype(np.float32)


@pytest.mark.parametrize("k,dilation,groups", [(3, 1, 1), (7, 3, 1), (7, 1, 8), (1, 1, 1)])
def test_causal_conv1d_matches_torch(k, dilation, groups):
    c_in, c_out, T = 8, 16, 12
    x = _rand(2, c_in, T)  # torch NCT
    w = _rand(c_out, c_in // groups, k)
    b = _rand(c_out)

    tconv = torch.nn.Conv1d(c_in, c_out, k, dilation=dilation, groups=groups, padding=0)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        pad = (k - 1) * dilation
        xt = torch.nn.functional.pad(torch.from_numpy(x), (pad, 0))
        want = tconv(xt).numpy()  # [B, C_out, T]

    w_jax = jnp.asarray(w.transpose(2, 1, 0))  # [W, I, O]
    got = conv.causal_conv1d(
        jnp.asarray(x.transpose(0, 2, 1)), w_jax, jnp.asarray(b),
        dilation=dilation, groups=groups,
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, atol=1e-4)


@pytest.mark.parametrize("k,stride", [(4, 2), (16, 8), (10, 5), (8, 4), (6, 3), (2, 2)])
def test_conv1d_transpose_matches_torch(k, stride):
    c_in, c_out, T = 6, 10, 9
    x = _rand(1, c_in, T)
    w = _rand(c_in, c_out, k)  # torch ConvTranspose1d layout [I, O, W]
    b = _rand(c_out)

    tconv = torch.nn.ConvTranspose1d(c_in, c_out, k, stride=stride, padding=0)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        want = tconv(torch.from_numpy(x)).numpy()

    w_jax = jnp.asarray(w.transpose(2, 1, 0))  # [W, O, I]
    got = conv.conv1d_transpose(
        jnp.asarray(x.transpose(0, 2, 1)), w_jax, jnp.asarray(b), stride=stride
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, atol=1e-4)


def test_causal_conv1d_transpose_length_and_trim():
    """Causal transpose conv outputs exactly T*stride samples
    (reference SpeechTokenizer.swift:339-353: trim kernel-stride right)."""
    k, s, T = 16, 8, 5
    x = jnp.asarray(_rand(1, T, 4))
    w = jnp.asarray(_rand(k, 4, 4))
    y = conv.causal_conv1d_transpose(x, w, None, stride=s)
    assert y.shape == (1, T * s, 4)
    full = conv.conv1d_transpose(x, w, None, stride=s)
    np.testing.assert_allclose(y, full[:, : T * s], atol=0)


def test_causal_conv_is_causal():
    """Changing future inputs must not change past outputs."""
    w = jnp.asarray(_rand(7, 4, 4))
    x1 = _rand(1, 20, 4)
    x2 = x1.copy()
    x2[:, 15:] += 1.0
    y1 = conv.causal_conv1d(jnp.asarray(x1), w, None)
    y2 = conv.causal_conv1d(jnp.asarray(x2), w, None)
    np.testing.assert_allclose(y1[:, :15], y2[:, :15], atol=1e-5)


def test_streamable_conv_exact_frames():
    """Mimi extra-padding: strided conv consumes the whole input
    (reference SpeechTokenizerEncoder.swift:114-118)."""
    for T in (29, 30, 31, 32, 64, 100):
        x = jnp.asarray(_rand(1, T, 4))
        w = jnp.asarray(_rand(8, 4, 4))
        y = conv.streamable_conv1d(x, w, None, stride=4, causal=True)
        assert y.shape[1] == -(-T // 4), (T, y.shape)


def test_streamable_conv_stride1_matches_causal():
    x = jnp.asarray(_rand(1, 16, 4))
    w = jnp.asarray(_rand(7, 4, 4))
    got = conv.streamable_conv1d(x, w, None, stride=1, causal=True)
    want = conv.causal_conv1d(x, w, None)
    np.testing.assert_allclose(got, want, atol=1e-5)
