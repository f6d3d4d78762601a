"""Tests for the native C++ runtime (safetensors mmap reader, WAV codec)."""

import os

import numpy as np
import pytest

native = pytest.importorskip("qwen3tts_tpu.native")

try:
    native._load()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native build unavailable")


def test_read_safetensors_matches_python(tmp_path):
    from safetensors.numpy import load_file, save_file

    w = {
        "x.weight": np.random.RandomState(0).randn(64, 32).astype(np.float32),
        "y.bias": np.arange(7, dtype=np.int64),
        "z": np.random.RandomState(1).randn(3, 3, 3).astype(np.float16),
    }
    p = str(tmp_path / "m.safetensors")
    save_file(w, p)
    got = native.read_safetensors(p)
    ref = load_file(p)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k])


def test_read_bf16_widened(tmp_path):
    import torch
    from safetensors.torch import save_file

    t = torch.randn(16, 8, dtype=torch.bfloat16)
    p = str(tmp_path / "bf.safetensors")
    save_file({"w": t}, p)
    got = native.read_safetensors(p)
    assert got["w"].dtype == np.float32
    np.testing.assert_array_equal(got["w"], t.float().numpy())


def test_loader_uses_native_path(tmp_path):
    """utils.loader prefers the native reader; results must be identical."""
    from qwen3tts_tpu.utils.loader import load_safetensors_dir
    from safetensors.numpy import save_file

    w = {"a": np.random.RandomState(2).rand(5, 5).astype(np.float32)}
    save_file(w, str(tmp_path / "p.safetensors"))
    got = load_safetensors_dir(str(tmp_path))
    np.testing.assert_array_equal(got["a"], w["a"])


def test_wav_roundtrip_native_and_cross_python(tmp_path):
    from qwen3tts_tpu.utils.audio import load_wav

    x = (np.sin(np.linspace(0, 60, 12000)) * 0.8).astype(np.float32)
    p = str(tmp_path / "n.wav")
    native.wav_write(p, x, 24000)
    rate, back = native.wav_read(p)
    assert rate == 24000
    np.testing.assert_allclose(back, x, atol=1e-4)
    # python reader parses the native writer's RIFF identically
    rate2, back2 = load_wav(p)
    assert rate2 == 24000
    np.testing.assert_array_equal(back, back2)


def test_open_missing_file():
    with pytest.raises(OSError):
        native.read_safetensors("/nonexistent/file.safetensors")
