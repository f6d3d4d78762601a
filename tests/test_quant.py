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
