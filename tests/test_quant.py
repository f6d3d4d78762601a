"""Tests for int4/int8 affine group quantization (pack, dequant, matmuls)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.ops import quant
from qwen3tts_tpu.utils.loader import dequantize_mlx


@pytest.mark.parametrize("bits", [4, 8])
def test_pack_dequant_roundtrip_error_bounded(bits):
    rs = np.random.RandomState(0)
    w = rs.randn(32, 256).astype(np.float32)
    packed, scales, biases = quant.pack_quantized(w, bits=bits, group=64)
    back = np.asarray(quant.dequantize(jnp.asarray(packed), jnp.asarray(scales),
                                       jnp.asarray(biases), bits=bits, group=64))
    # max quantization error is half a step per group
    step = np.repeat(scales, 64, axis=1)
    assert (np.abs(back - w) <= step * 0.5 + 1e-5).all()


def test_pack_matches_loader_dequant():
    """ops.quant packing and the loader's MLX dequant agree on the format."""
    rs = np.random.RandomState(1)
    w = rs.randn(8, 128).astype(np.float32)
    packed, scales, biases = quant.pack_quantized(w, bits=4, group=64)
    a = dequantize_mlx(packed, scales, biases, bits=4, group=64)
    b = np.asarray(quant.dequantize(jnp.asarray(packed), jnp.asarray(scales),
                                    jnp.asarray(biases), bits=4, group=64))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_quant_matmul_matches_dense():
    rs = np.random.RandomState(2)
    w = rs.randn(96, 128).astype(np.float32)
    x = rs.randn(1, 128).astype(np.float32)
    packed, scales, biases = quant.pack_quantized(w, bits=4, group=64)
    y = np.asarray(quant.quant_matmul(jnp.asarray(x), jnp.asarray(packed),
                                      jnp.asarray(scales), jnp.asarray(biases)))
    w_deq = np.asarray(quant.dequantize(jnp.asarray(packed), jnp.asarray(scales),
                                        jnp.asarray(biases)))
    np.testing.assert_allclose(y, x @ w_deq.T, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("O,I", [(256, 512), (512, 256)])
def test_pallas_kernel_matches_xla_interpret(O, I):
    """Pallas dequant-in-matmul (interpret mode on CPU) == XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    rs = np.random.RandomState(3)
    w = rs.randn(O, I).astype(np.float32)
    x = rs.randn(1, I).astype(np.float32)
    packed, scales, biases = quant.pack_quantized(w, bits=4, group=64)
    ref = np.asarray(quant.quant_matmul(jnp.asarray(x), jnp.asarray(packed),
                                        jnp.asarray(scales), jnp.asarray(biases)))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(quant.quant_matmul_pallas(
            jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scales),
            jnp.asarray(biases), block_o=128,
        ))
    np.testing.assert_allclose(y, ref, rtol=1e-3, atol=1e-3)


class TestQuantizedCheckpoint:
    """End-to-end: int4 checkpoint -> packed load -> generation."""

    @pytest.fixture(scope="class")
    def ckpt_dir(self, tmp_path_factory):
        from synthetic_ckpt import write_checkpoint

        return write_checkpoint(
            str(tmp_path_factory.mktemp("qckpt")), quantize=True
        )

    def _model(self, ckpt_dir, keep_packed):
        from qwen3tts_tpu.tts import Qwen3TTSModel
        from synthetic_ckpt import StubTokenizer

        m = Qwen3TTSModel.from_pretrained(
            ckpt_dir, dtype=jnp.float32, keep_packed=keep_packed
        )
        m.tokenizer = StubTokenizer()
        return m

    def test_loader_keeps_packed(self, ckpt_dir):
        from qwen3tts_tpu.ops.quant import PackedLinear
        from qwen3tts_tpu.utils.loader import Checkpoint

        ckpt = Checkpoint(ckpt_dir, jnp.float32)  # default: packed
        assert isinstance(ckpt.talker_params["layers"]["q_proj"], PackedLinear)
        assert isinstance(ckpt.talker_params["codec_head"], PackedLinear)
        assert isinstance(ckpt.cp_params["lm_head"], PackedLinear)
        # embeddings were not quantized in this checkpoint -> plain arrays
        assert not isinstance(ckpt.talker_params["codec_embedding"], PackedLinear)

    def test_packed_generation_matches_dequantized(self, ckpt_dir):
        """Greedy generation: packed (XLA path on CPU) == dequantize-at-load."""
        m_packed = self._model(ckpt_dir, keep_packed=True)
        m_dense = self._model(ckpt_dir, keep_packed=False)
        a1 = m_packed.generate("Packed test", speaker="Aiden", temperature=0.0,
                               max_tokens=5, seed=0)
        a2 = m_dense.generate("Packed test", speaker="Aiden", temperature=0.0,
                              max_tokens=5, seed=0)
        np.testing.assert_allclose(a1, a2, atol=1e-5)

    def test_quantization_config_parsed(self, ckpt_dir):
        from qwen3tts_tpu.utils.loader import Checkpoint

        ckpt = Checkpoint(ckpt_dir, jnp.float32)
        assert ckpt.config.quantization.bits == 4
        assert ckpt.config.quantization.group_size == 32


class TestInt8Runtime:
    """Weight-only int8 runtime quantization (ops.quant.Int8Linear)."""

    def test_quantize_roundtrip_error_bounded(self):
        rs = np.random.RandomState(3)
        w = rs.randn(128, 64).astype(np.float32)
        q = quant.quantize_int8(w)
        back = np.asarray(q.q, np.float32) * np.asarray(q.scale)
        # per-output-channel symmetric: error <= half a step
        step = np.abs(w).max(axis=0, keepdims=True) / 127.0
        assert (np.abs(back - w) <= step * 0.5 + 1e-6).all()

    def test_int8_matmul_close_to_dense(self):
        rs = np.random.RandomState(4)
        w = rs.randn(256, 96).astype(np.float32) / 16.0
        x = rs.randn(2, 256).astype(np.float32)
        y8 = np.asarray(quant.int8_matmul(jnp.asarray(x), quant.quantize_int8(w)))
        ref = x @ w
        assert np.abs(y8 - ref).max() / np.abs(ref).max() < 2e-2

    def test_stacked_getitem_matches_per_layer(self):
        rs = np.random.RandomState(5)
        w = rs.randn(3, 32, 16).astype(np.float32)
        stacked = quant.quantize_int8(w)
        per = quant.quantize_int8(w[1])
        np.testing.assert_array_equal(np.asarray(stacked[1].q), np.asarray(per.q))
        np.testing.assert_allclose(
            np.asarray(stacked[1].scale), np.asarray(per.scale), rtol=1e-6
        )

    def test_from_pretrained_int8_generates(self, tmp_path_factory):
        from qwen3tts_tpu.ops.quant import Int8Linear
        from qwen3tts_tpu.tts import Qwen3TTSModel
        from synthetic_ckpt import StubTokenizer, write_checkpoint

        d = write_checkpoint(str(tmp_path_factory.mktemp("int8ckpt")))
        m = Qwen3TTSModel.from_pretrained(d, dtype=jnp.float32, quantize="int8")
        m.tokenizer = StubTokenizer()
        # int8 auto-fuses talker AND CP projections (both decode in the
        # fused Pallas kernels, where one qkv matvec replaces three)
        assert isinstance(m.talker_params["layers"]["qkv_proj"], Int8Linear)
        assert isinstance(m.talker_params["codec_head"], Int8Linear)
        assert isinstance(m.cp_params["layers"]["qkv_proj"], Int8Linear)
        assert isinstance(m.cp_params["lm_head"], Int8Linear)
        audio = m.generate("Int8 runtime", speaker="Aiden", max_tokens=6, seed=0)
        assert audio.shape[0] > 0 and np.isfinite(audio).all()

    def test_int8_on_int4_checkpoint_dequantizes_first(self, tmp_path_factory):
        from qwen3tts_tpu.ops.quant import Int8Linear
        from qwen3tts_tpu.tts import Qwen3TTSModel
        from synthetic_ckpt import StubTokenizer, write_checkpoint

        d = write_checkpoint(str(tmp_path_factory.mktemp("i4i8ckpt")), quantize=True)
        m = Qwen3TTSModel.from_pretrained(d, dtype=jnp.float32, quantize="int8")
        m.tokenizer = StubTokenizer()
        assert isinstance(m.talker_params["layers"]["qkv_proj"], Int8Linear)
        audio = m.generate("Int4 to int8", speaker="Aiden", max_tokens=5, seed=1)
        assert audio.shape[0] > 0 and np.isfinite(audio).all()
