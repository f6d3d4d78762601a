"""Tests for the speech-tokenizer encoder (Mimi) and ECAPA speaker encoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.config import SpeakerEncoderConfig, TokenizerEncoderConfig
from qwen3tts_tpu.models import encoder as enc
from qwen3tts_tpu.models import speaker_encoder as spk

TINY_ENC = TokenizerEncoderConfig(
    codebook_dim=8,
    codebook_size=32,
    hidden_size=16,
    intermediate_size=32,
    kernel_size=7,
    num_attention_heads=2,
    num_filters=2,
    num_hidden_layers=2,
    num_key_value_heads=2,
    num_quantizers=32,
    upsampling_ratios=(8, 6, 5, 4),
)


class TestSpeechEncoder:
    @pytest.fixture(scope="class")
    def params(self):
        return enc.init_encoder_params(jax.random.PRNGKey(0), TINY_ENC)

    def test_encode_shapes_and_rate(self, params):
        """1920 samples -> 1 frame at 12.5 Hz; first 16 of 32 quantizers."""
        audio = jax.random.normal(jax.random.PRNGKey(1), (1, 3 * 24000)) * 0.1
        codes = enc.encode(params, TINY_ENC, audio)
        # 3 s @ 12.5 Hz = ceil -> ~38 frames (exact-frame padding)
        assert codes.shape[0] == 1 and codes.shape[1] == 16
        assert abs(codes.shape[2] - round(3 * 24000 / 1920)) <= 1
        c = np.asarray(codes)
        assert (c >= 0).all() and (c < TINY_ENC.codebook_size).all()

    def test_euclidean_encode_is_argmin(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8))
        emb = jax.random.normal(jax.random.PRNGKey(3), (32, 8))
        got = enc._euclidean_encode(x, emb)
        d = ((np.asarray(x)[:, :, None] - np.asarray(emb)[None, None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(got), d.argmin(-1))

    def test_codebook_embedding_derivation(self):
        """embedding = embed_sum / clamp(usage, eps) (reference :737-744)."""
        layer = {
            "embedding_sum": jnp.asarray([[2.0, 4.0], [3.0, 3.0]]),
            "cluster_usage": jnp.asarray([2.0, 0.0]),
        }
        emb = enc.codebook_embedding(layer)
        np.testing.assert_allclose(np.asarray(emb)[0], [1.0, 2.0])
        np.testing.assert_allclose(np.asarray(emb)[1], [3e5, 3e5])  # /1e-5

    def test_rvq_residual_refinement(self):
        """With enough quantizers, RVQ reconstruction error decreases."""
        params = enc.init_encoder_params(jax.random.PRNGKey(4), TINY_ENC)
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 6, TINY_ENC.hidden_size))
        p = params["quantizer"]["rvq_rest"]
        h = x @ p["input_proj"]
        residual = h
        errs = []
        for i in range(4):
            emb = enc.codebook_embedding(p["layers"][i])
            idx = enc._euclidean_encode(residual, emb)
            residual = residual - emb[idx]
            errs.append(float((residual**2).mean()))
        assert errs[-1] < errs[0]


class TestSpeakerEncoder:
    CFG = SpeakerEncoderConfig(
        mel_dim=16,
        enc_dim=32,
        enc_channels=(16, 16, 16, 16, 48),
        enc_attention_channels=8,
        enc_res2net_scale=4,
        enc_se_channels=8,
    )

    @pytest.fixture(scope="class")
    def params(self):
        return spk.init_speaker_encoder_params(jax.random.PRNGKey(0), self.CFG)

    def test_mel_spectrogram_shape(self):
        audio = jnp.asarray(np.random.RandomState(0).randn(24000).astype(np.float32))
        mels = spk.mel_spectrogram(audio, num_mels=16)
        # center-padded: frames = (samples + 2*512 - 1024)//256 + 1
        assert mels.shape == (1, 24000 // 256 + 1, 16)
        assert np.isfinite(np.asarray(mels)).all()

    def test_mel_filterbank_rows_triangular(self):
        fb = spk.mel_filterbank(1024, 128, 24000, 0.0, 12000.0)
        assert fb.shape == (513, 128)
        assert fb.min() >= 0 and fb.max() <= 1.0

    def test_xvector_shape_and_time_invariance_of_dim(self, params):
        for sec in (1, 2):
            audio = jnp.asarray(
                np.random.RandomState(sec).randn(sec * 24000).astype(np.float32) * 0.1
            )
            xv = spk.extract_embedding(params, self.CFG, audio)
            assert xv.shape == (1, 32)
            assert np.isfinite(np.asarray(xv)).all()

    def test_res2net_concat_width(self, params):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 16))
        out = spk.res2net_block(
            params["blocks"][1]["res2net_block"], x, scale=4, dilation=2
        )
        assert out.shape == (1, 10, 16)

    def test_attentive_pooling_weights_sum_to_one(self, params):
        """ASP output is a weighted mean: pooling constant input returns it."""
        x = jnp.ones((1, 12, 48)) * 0.5
        pooled = spk.attentive_stats_pooling(params["asp"], x)
        assert pooled.shape == (1, 1, 96)
        np.testing.assert_allclose(np.asarray(pooled)[0, 0, :48], 0.5, atol=1e-4)
        # std of a constant signal ~ 0
        assert np.abs(np.asarray(pooled)[0, 0, 48:]).max() < 1e-3


class TestMelPrecision:
    def test_mel_spectrogram_matches_float64_numpy(self):
        """jnp.fft.rfft precision check (VERDICT r2 item 6b / ROADMAP):
        the full f32 STFT+mel pipeline vs an independent float64 numpy
        implementation on realistic synthetic audio. A systematic FFT
        deviation would silently shift the x-vector that conditions voice
        cloning; this pins the whole path to within float32 rounding."""
        rs = np.random.RandomState(7)
        t = np.arange(24000 * 2) / 24000.0
        audio = (
            0.4 * np.sin(2 * np.pi * 220.0 * t)
            + 0.2 * np.sin(2 * np.pi * 1731.0 * t + 0.3)
            + 0.1 * np.sin(2 * np.pi * 7901.0 * t + 1.1)
            + 0.05 * rs.randn(t.size)
        ).astype(np.float64)

        n_fft, hop, num_mels = 1024, 256, 128
        # independent float64 reference (same spec: center-pad, hann
        # periodic-ish (size-1 denominator), power, integer-bin mel, log)
        x = np.pad(audio, (n_fft // 2, n_fft // 2))
        num_frames = (x.size - n_fft) // hop + 1
        idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None]
        n = np.arange(n_fft, dtype=np.float64)
        win = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / (n_fft - 1)))
        frames = x[idx] * win
        spec = np.fft.rfft(frames, axis=-1)
        power = np.abs(spec) ** 2
        fb = spk.mel_filterbank(n_fft, num_mels, 24000, 0.0, 12000.0).astype(np.float64)
        ref = np.log(np.maximum(power @ fb, 1e-10))  # [frames, mels]

        got = np.asarray(
            spk.mel_spectrogram(jnp.asarray(audio, jnp.float32))
        )[0]
        assert got.shape == ref.shape
        # log-domain absolute error: float32 FFT keeps ~6 significant
        # digits; anything > 1e-2 here would indicate a systematic
        # STFT/windowing deviation rather than rounding
        err = np.abs(got - ref.astype(np.float32))
        assert err.max() < 1e-2, err.max()
        assert err.mean() < 1e-3, err.mean()
