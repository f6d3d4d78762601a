"""Model-level tests with synthetic weights at tiny shapes.

The key oracle (no checkpoints in CI): *incremental decode with the static
KV cache must match full-sequence prefill*, and the fused while_loop
generation must match a step-by-step Python loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.config import CodePredictorConfig, TalkerConfig, TokenizerDecoderConfig
from qwen3tts_tpu.models import code_predictor as cp
from qwen3tts_tpu.models import generate as gen
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.models import vocoder as vc

TINY_TALKER = TalkerConfig(
    vocab_size=3072,
    text_vocab_size=256,
    hidden_size=64,
    text_hidden_size=48,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    rope_scaling=None,
    code_predictor_config=CodePredictorConfig(
        vocab_size=2048,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=1,
        head_dim=16,
    ),
)
TINY_CP = TINY_TALKER.code_predictor_config


@pytest.fixture(scope="module")
def talker_params():
    return tk.init_talker_params(jax.random.PRNGKey(0), TINY_TALKER, jnp.float32)


@pytest.fixture(scope="module")
def cp_params():
    return cp.init_code_predictor_params(
        jax.random.PRNGKey(1), TINY_CP, TINY_TALKER.hidden_size, jnp.float32
    )


class TestTalker:
    def test_prefill_matches_incremental_decode(self, talker_params):
        """Full-sequence forward == token-by-token decode through the cache."""
        T = 7
        x = jax.random.normal(jax.random.PRNGKey(2), (1, T, TINY_TALKER.hidden_size))

        cache = tk.make_cache(TINY_TALKER, 1, 16, jnp.float32)
        h_full, _ = tk.forward(talker_params, TINY_TALKER, x, cache, jnp.int32(0))

        cache = tk.make_cache(TINY_TALKER, 1, 16, jnp.float32)
        outs = []
        for t in range(T):
            h, cache = tk.forward(
                talker_params, TINY_TALKER, x[:, t : t + 1], cache, jnp.int32(t)
            )
            outs.append(h)
        h_inc = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(h_full, h_inc, atol=1e-5)

    def test_prefill_padding_is_inert(self, talker_params):
        """Right-padding the prompt must not change real-token outputs."""
        T, pad_to = 5, 12
        x = jax.random.normal(jax.random.PRNGKey(3), (1, T, TINY_TALKER.hidden_size))
        x_pad = jnp.pad(x, ((0, 0), (0, pad_to - T), (0, 0)))

        cache = tk.make_cache(TINY_TALKER, 1, 32, jnp.float32)
        h_real, _ = tk.forward(talker_params, TINY_TALKER, x, cache, jnp.int32(0))
        cache = tk.make_cache(TINY_TALKER, 1, 32, jnp.float32)
        h_pad, _ = tk.forward(talker_params, TINY_TALKER, x_pad, cache, jnp.int32(0))
        np.testing.assert_allclose(h_real, h_pad[:, :T], atol=1e-5)

    def test_decode_after_padded_prefill(self, talker_params):
        """Decode steps after a padded prefill must match unpadded history
        (garbage KV slots are overwritten before they can be attended)."""
        T, pad_to = 5, 8
        key = jax.random.PRNGKey(4)
        x = jax.random.normal(key, (1, T + 3, TINY_TALKER.hidden_size))

        # unpadded: process everything as one block
        cache = tk.make_cache(TINY_TALKER, 1, 32, jnp.float32)
        h_ref, _ = tk.forward(talker_params, TINY_TALKER, x, cache, jnp.int32(0))

        # padded prefill of first T, then 3 single-token decode steps
        cache = tk.make_cache(TINY_TALKER, 1, 32, jnp.float32)
        x_pad = jnp.pad(x[:, :T], ((0, 0), (0, pad_to - T), (0, 0)))
        _, cache = tk.forward(talker_params, TINY_TALKER, x_pad, cache, jnp.int32(0))
        outs = []
        for i in range(3):
            h, cache = tk.forward(
                talker_params, TINY_TALKER, x[:, T + i : T + i + 1], cache, jnp.int32(T + i)
            )
            outs.append(h)
        np.testing.assert_allclose(
            jnp.concatenate(outs, 1), h_ref[:, T:], atol=1e-5
        )

    def test_codec_logits_shape_dtype(self, talker_params):
        h = jnp.ones((1, 3, TINY_TALKER.hidden_size))
        logits = tk.codec_logits(talker_params, h)
        assert logits.shape == (1, 3, TINY_TALKER.vocab_size)
        assert logits.dtype == jnp.float32

    def test_per_layer_pruned_widths_zero_padded(self):
        """Pruned per-layer MLP widths: zero-padding == exact pruning."""
        cfg = TINY_TALKER
        pruned = TalkerConfig(
            **{
                **{f.name: getattr(cfg, f.name) for f in cfg.__dataclass_fields__.values()},
                "per_layer_intermediate_sizes": (128, 96),
            }
        )
        params = tk.init_talker_params(jax.random.PRNGKey(5), pruned, jnp.float32)
        # padded tail of layer 1 must be zero
        assert np.asarray(params["layers"]["gate_proj"][1][:, 96:] == 0).all()
        x = jax.random.normal(jax.random.PRNGKey(6), (1, 4, cfg.hidden_size))
        cache = tk.make_cache(pruned, 1, 8, jnp.float32)
        h, _ = tk.forward(params, pruned, x, cache, jnp.int32(0))
        assert np.isfinite(np.asarray(h)).all()

    def test_token_map_indirection(self, talker_params):
        """Pruned-vocab token map: gather before embedding lookup
        (reference Talker.swift:627-633)."""
        params = dict(talker_params)
        ids = jnp.asarray([[5, 9]])
        base = tk.embed_text(params, TINY_TALKER, ids)
        tmap = jnp.zeros((TINY_TALKER.text_vocab_size,), jnp.int32).at[5].set(7)
        params["text_token_map"] = tmap
        mapped = tk.embed_text(params, TINY_TALKER, ids)
        np.testing.assert_allclose(
            mapped[0, 0], tk.embed_text(talker_params, TINY_TALKER, jnp.asarray([[7]]))[0, 0]
        )
        np.testing.assert_allclose(
            mapped[0, 1], tk.embed_text(talker_params, TINY_TALKER, jnp.asarray([[0]]))[0, 0]
        )
        assert not np.allclose(mapped[0, 0], base[0, 0])


class TestCodePredictor:
    def test_prefill_matches_incremental(self, cp_params):
        x = jax.random.normal(jax.random.PRNGKey(7), (1, 4, TINY_TALKER.hidden_size))
        cache = cp.make_cp_cache(TINY_CP, 1, jnp.float32)
        h_full, _ = cp.forward(cp_params, TINY_CP, x, cache, jnp.int32(0))
        cache = cp.make_cp_cache(TINY_CP, 1, jnp.float32)
        outs = []
        for t in range(4):
            h, cache = cp.forward(cp_params, TINY_CP, x[:, t : t + 1], cache, jnp.int32(t))
            outs.append(h)
        np.testing.assert_allclose(h_full, jnp.concatenate(outs, 1), atol=1e-5)

    def test_predict_codes_shapes_and_range(self, cp_params, talker_params):
        hidden = jax.random.normal(jax.random.PRNGKey(8), (1, TINY_TALKER.hidden_size))
        code0 = jnp.asarray([11], jnp.int32)
        codes = cp.predict_codes(
            cp_params, TINY_CP, talker_params, hidden, code0,
            jax.random.PRNGKey(9), temperature=0.9, top_k=50, top_p=1.0,
        )
        assert codes.shape == (1, 15)
        c = np.asarray(codes)
        assert (c >= 0).all() and (c < TINY_CP.vocab_size).all()

    def test_predict_codes_greedy_matches_manual(self, cp_params, talker_params):
        """Fused scan inner loop == hand-rolled per-step loop (greedy)."""
        hidden = jax.random.normal(jax.random.PRNGKey(10), (1, TINY_TALKER.hidden_size))
        code0 = jnp.asarray([3], jnp.int32)
        fused = cp.predict_codes(
            cp_params, TINY_CP, talker_params, hidden, code0,
            jax.random.PRNGKey(0), temperature=0.0, top_k=0, top_p=1.0,
        )

        # manual replication of the reference inner loop (Qwen3.swift:674-705)
        cache = cp.make_cp_cache(TINY_CP, 1, jnp.float32)
        x0 = jnp.stack([hidden, talker_params["codec_embedding"][code0]], axis=1)
        h, cache = cp.forward(cp_params, TINY_CP, x0, cache, jnp.int32(0))
        codes = [int(jnp.argmax(cp.head_logits(cp_params, h[:, -1], 0)))]
        for i in range(1, 15):
            emb = cp_params["codec_embedding"][i - 1][jnp.asarray([codes[-1]])]
            h, cache = cp.forward(cp_params, TINY_CP, emb[:, None], cache, jnp.int32(i + 1))
            codes.append(int(jnp.argmax(cp.head_logits(cp_params, h[:, -1], i))))
        np.testing.assert_array_equal(np.asarray(fused)[0], codes)

    def test_sum_codec_embeddings(self, cp_params, talker_params):
        code0 = jnp.asarray([2], jnp.int32)
        rest = jnp.arange(15, dtype=jnp.int32)[None]
        got = cp.sum_codec_embeddings(cp_params, talker_params, code0, rest)
        want = talker_params["codec_embedding"][2]
        for i in range(15):
            want = want + cp_params["codec_embedding"][i][i]
        np.testing.assert_allclose(got[0], want, atol=1e-5)


TINY_VOCODER = TokenizerDecoderConfig(
    latent_dim=32,
    codebook_dim=16,
    codebook_size=64,
    decoder_dim=64,
    hidden_size=16,
    intermediate_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_key_value_heads=2,
    head_dim=8,
    num_quantizers=16,
    semantic_codebook_size=128,
)


class TestVocoder:
    @pytest.fixture(scope="class")
    def params(self):
        return vc.init_vocoder_params(jax.random.PRNGKey(0), TINY_VOCODER, jnp.float32)

    def test_decode_shapes_and_lengths(self, params):
        codes = jax.random.randint(jax.random.PRNGKey(1), (1, 5, 16), 1, 64)
        wav, lengths = vc.decode(params, TINY_VOCODER, codes)
        assert wav.shape == (1, 5 * TINY_VOCODER.total_upsample)
        assert int(lengths[0]) == 5 * TINY_VOCODER.total_upsample
        assert TINY_VOCODER.total_upsample == 1920
        assert np.abs(np.asarray(wav)).max() <= 1.0

    def test_valid_length_counts_positive_first_codebook(self, params):
        codes = jax.random.randint(jax.random.PRNGKey(2), (1, 6, 16), 1, 64)
        codes = codes.at[0, 4:, 0].set(0)  # 2 trailing "pad" frames
        _, lengths = vc.decode(params, TINY_VOCODER, codes)
        assert int(lengths[0]) == 4 * 1920

    def test_rvq_decode_matches_manual(self, params):
        codes = jax.random.randint(jax.random.PRNGKey(3), (1, 3, 16), 0, 64)
        got = vc.rvq_decode(params, TINY_VOCODER, codes)
        q = params["quantizer"]
        sem = q["rvq_first"]["codebooks"][0][codes[..., 0]]
        want = sem @ q["rvq_first"]["output_proj"]["w"]
        ac = sum(q["rvq_rest"]["codebooks"][i][codes[..., 1 + i]] for i in range(15))
        want = want + ac @ q["rvq_rest"]["output_proj"]["w"]
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_bucketed_decode_is_prefix_exact(self, params):
        """Right-padding codes to a bucket with ``frames`` masking must give
        bit-identical prefix audio (pre-transformer attention is masked;
        everything downstream is causal)."""
        codes = jax.random.randint(jax.random.PRNGKey(4), (1, 4, 16), 1, 64)
        codes_pad = jnp.concatenate([codes, jnp.zeros((1, 3, 16), jnp.int32)], axis=1)
        wav1, len1 = vc.decode(params, TINY_VOCODER, codes)
        wav2, len2 = vc.decode(params, TINY_VOCODER, codes_pad, jnp.int32(4))
        assert int(len1[0]) == int(len2[0]) == 4 * 1920
        np.testing.assert_allclose(wav2[:, : 4 * 1920], wav1, atol=1e-5)

    def test_unmasked_padding_would_corrupt(self, params):
        """Sanity: without the frames mask, pad frames leak through the
        bidirectional pre-transformer (this is why the mask exists)."""
        codes = jax.random.randint(jax.random.PRNGKey(5), (1, 4, 16), 1, 64)
        codes_pad = jnp.concatenate([codes, jnp.zeros((1, 3, 16), jnp.int32)], axis=1)
        wav1, _ = vc.decode(params, TINY_VOCODER, codes)
        wav2, _ = vc.decode(params, TINY_VOCODER, codes_pad)
        assert not np.allclose(np.asarray(wav2)[:, : 4 * 1920], np.asarray(wav1), atol=1e-5)


class TestFusedProjections:
    def test_fused_forward_matches_unfused(self, talker_params):
        from qwen3tts_tpu.models.talker import fuse_layer_projections

        x = jax.random.normal(jax.random.PRNGKey(11), (1, 5, TINY_TALKER.hidden_size))
        cache = tk.make_cache(TINY_TALKER, 1, 16, jnp.float32)
        h_ref, _ = tk.forward(talker_params, TINY_TALKER, x, cache, jnp.int32(0))

        fused = dict(talker_params)
        fused["layers"] = fuse_layer_projections(talker_params["layers"])
        assert "qkv_proj" in fused["layers"] and "q_proj" not in fused["layers"]
        cache = tk.make_cache(TINY_TALKER, 1, 16, jnp.float32)
        h_fused, _ = tk.forward(fused, TINY_TALKER, x, cache, jnp.int32(0))
        np.testing.assert_allclose(h_fused, h_ref, atol=1e-5)

    def test_fused_packed_matches_unfused_packed(self):
        """PackedLinear concat along O preserves quantized numerics."""
        from qwen3tts_tpu.models.talker import fuse_layer_projections
        from qwen3tts_tpu.utils import host_init as hi

        p_np = hi.host_init_talker_params(3, TINY_TALKER)
        packed = hi.pack_linear_params(p_np, group=32)
        x = jax.random.normal(jax.random.PRNGKey(12), (1, 3, TINY_TALKER.hidden_size))

        dev = hi.to_device(packed, jnp.float32)
        cache = tk.make_cache(TINY_TALKER, 1, 16, jnp.float32)
        h_ref, _ = tk.forward(dev, TINY_TALKER, x, cache, jnp.int32(0))

        fused = dict(packed)
        fused["layers"] = fuse_layer_projections(packed["layers"])
        dev_f = hi.to_device(fused, jnp.float32)
        cache = tk.make_cache(TINY_TALKER, 1, 16, jnp.float32)
        h_fused, _ = tk.forward(dev_f, TINY_TALKER, x, cache, jnp.int32(0))
        np.testing.assert_allclose(h_fused, h_ref, atol=1e-5)
