"""Tests for the fused on-device generation loop (models/generate.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.models import code_predictor as cp
from qwen3tts_tpu.models import generate as gen
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.sampling import build_suppress_mask

from test_models import TINY_CP, TINY_TALKER


@pytest.fixture(scope="module")
def params():
    talker = tk.init_talker_params(jax.random.PRNGKey(0), TINY_TALKER, jnp.float32)
    cpp = cp.init_code_predictor_params(
        jax.random.PRNGKey(1), TINY_CP, TINY_TALKER.hidden_size, jnp.float32
    )
    return talker, cpp


def _run_fused(params, prefill, prefill_len, trailing, trailing_len, pad, max_steps,
               max_frames=12, sampling=None):
    talker, cpp = params
    sampling = sampling or gen.SamplingConfig(temperature=0.0, top_k=0, top_p=1.0,
                                              repetition_penalty=1.0)
    cache = tk.make_cache(TINY_TALKER, 1, 64, jnp.float32)
    return gen.generate_codes(
        talker, cpp,
        talker_cfg=TINY_TALKER, cp_cfg=TINY_CP, sampling=sampling,
        prefill_embeds=prefill, prefill_len=jnp.int32(prefill_len),
        trailing_embeds=trailing, trailing_len=jnp.int32(trailing_len),
        tts_pad_embed=pad, cache=cache,
        max_steps=jnp.int32(max_steps), max_frames=max_frames,
        key=jax.random.PRNGKey(42),
    )


def _manual_greedy(params, prefill, prefill_len, trailing, trailing_len, pad, max_steps):
    """Step-by-step replication of the reference decode loop
    (Qwen3.swift:640-729), greedy, pure Python host loop."""
    talker, cpp = params
    cfg, cpc = TINY_TALKER, TINY_CP
    suppress = build_suppress_mask(cfg.vocab_size, cfg.codec_eos_token_id)
    cache = tk.make_cache(cfg, 1, 64, jnp.float32)
    cur = prefill[:, :prefill_len]
    offset = 0
    seen = jnp.zeros((cfg.vocab_size,), bool)
    rows, toks = [], []
    for step in range(max_steps):
        h, cache = tk.forward(talker, cfg, cur, cache, jnp.int32(offset))
        offset += cur.shape[1]
        logits = tk.codec_logits(talker, h)[0, -1]
        logits = jnp.where(suppress, -jnp.inf, logits)
        code0 = int(jnp.argmax(logits))
        seen = seen.at[code0].set(True)
        toks.append(code0)
        if code0 == cfg.codec_eos_token_id:
            break
        rest = cp.predict_codes(
            cpp, cpc, talker, h[:, -1], jnp.asarray([code0], jnp.int32),
            jax.random.PRNGKey(0), temperature=0.0, top_k=0, top_p=1.0,
        )
        rows.append([code0] + list(np.asarray(rest)[0]))
        text = trailing[step] if step < trailing_len else pad
        codec = cp.sum_codec_embeddings(cpp, talker, jnp.asarray([code0], jnp.int32), rest)
        cur = (text[None] + codec)[:, None]
    return rows, toks


class TestGenerateLoop:
    def test_fused_matches_manual_greedy(self, params):
        h = TINY_TALKER.hidden_size
        prefill = jax.random.normal(jax.random.PRNGKey(2), (1, 8, h)) * 0.1
        trailing = jax.random.normal(jax.random.PRNGKey(3), (6, h)) * 0.1
        pad = jax.random.normal(jax.random.PRNGKey(4), (h,)) * 0.1

        res = _run_fused(params, prefill, 8, trailing, 6, pad, max_steps=10)
        rows, _ = _manual_greedy(params, prefill, 8, trailing, 6, pad, max_steps=10)

        n = int(res.n_frames)
        assert n == len(rows) and n > 0
        np.testing.assert_array_equal(np.asarray(res.codes)[:n], np.asarray(rows))

    def test_padded_prefill_same_result(self, params):
        h = TINY_TALKER.hidden_size
        prefill = jax.random.normal(jax.random.PRNGKey(5), (1, 7, h)) * 0.1
        trailing = jax.random.normal(jax.random.PRNGKey(6), (4, h)) * 0.1
        pad = jnp.zeros((h,))
        prefill_padded = jnp.pad(prefill, ((0, 0), (0, 9), (0, 0)))

        r1 = _run_fused(params, prefill, 7, trailing, 4, pad, max_steps=6)
        r2 = _run_fused(params, prefill_padded, 7, trailing, 4, pad, max_steps=6)
        assert int(r1.n_frames) == int(r2.n_frames)
        np.testing.assert_array_equal(r1.codes, r2.codes)

    def test_max_steps_cap(self, params):
        h = TINY_TALKER.hidden_size
        prefill = jax.random.normal(jax.random.PRNGKey(7), (1, 4, h)) * 0.1
        trailing = jnp.zeros((2, h))
        res = _run_fused(params, prefill, 4, trailing, 2, jnp.zeros((h,)), max_steps=3)
        assert int(res.n_frames) <= 3

    def test_sampled_run_reproducible_and_valid(self, params):
        h = TINY_TALKER.hidden_size
        prefill = jax.random.normal(jax.random.PRNGKey(8), (1, 4, h)) * 0.1
        trailing = jnp.zeros((2, h))
        s = gen.SamplingConfig(temperature=0.9, top_k=50, top_p=1.0, repetition_penalty=1.05)
        r1 = _run_fused(params, prefill, 4, trailing, 2, jnp.zeros((h,)), 5, sampling=s)
        r2 = _run_fused(params, prefill, 4, trailing, 2, jnp.zeros((h,)), 5, sampling=s)
        np.testing.assert_array_equal(r1.codes, r2.codes)  # same key -> same result
        n = int(r1.n_frames)
        c = np.asarray(r1.codes)[:n]
        # every recorded frame's codebook-0 token must be a real codec code
        # (EOS frames are never recorded — _record skips them)
        assert (c[:, 0] < 2048).all()
        assert not (c[:, 0] == TINY_TALKER.codec_eos_token_id).any()
        assert (c >= 0).all()

    def test_chunked_generation_matches_one_shot(self, params):
        """Streaming path: prefill_start + N generate_chunk calls must equal
        the single-program generate_codes (same RNG, same buffers)."""
        talker, cpp = params
        h = TINY_TALKER.hidden_size
        prefill = jax.random.normal(jax.random.PRNGKey(9), (1, 4, h)) * 0.1
        trailing = jnp.zeros((2, h))
        pad = jnp.zeros((h,))
        sampling = gen.SamplingConfig(temperature=0.0, top_k=0, top_p=1.0,
                                      repetition_penalty=1.0)
        one = _run_fused(params, prefill, 4, trailing, 2, pad, 8, sampling=sampling)

        carry = gen.prefill_start(
            talker, cpp, talker_cfg=TINY_TALKER, cp_cfg=TINY_CP, sampling=sampling,
            prefill_embeds=prefill, prefill_len=jnp.int32(4),
            trailing_embeds=trailing, trailing_len=jnp.int32(2),
            tts_pad_embed=pad, cache=tk.make_cache(TINY_TALKER, 1, 64, jnp.float32),
            max_frames=12, key=jax.random.PRNGKey(42),
        )
        emitted = list(np.asarray(carry.tokens)[: int(carry.step)])
        for until in (3, 5, 8):
            prev = int(carry.step)
            carry = gen.generate_chunk(
                talker, cpp, carry, talker_cfg=TINY_TALKER, cp_cfg=TINY_CP,
                sampling=sampling, trailing_embeds=trailing,
                trailing_len=jnp.int32(2), tts_pad_embed=pad,
                until_step=jnp.int32(until),
            )
            emitted += list(np.asarray(carry.tokens)[prev : int(carry.step)])
        n = int(one.n_frames)
        assert int(carry.step) == n
        np.testing.assert_array_equal(np.asarray(carry.codes), np.asarray(one.codes))
        np.testing.assert_array_equal(emitted, np.asarray(one.tokens)[:n])

    def test_pad_to_bucket(self):
        assert gen.pad_to_bucket(1) == 64
        assert gen.pad_to_bucket(64) == 64
        assert gen.pad_to_bucket(65) == 128
        assert gen.pad_to_bucket(3000) == 3072


class TestFusedAudioBuckets:
    """_generate_and_decode's lax.switch vocoder: decode only the smallest
    GEN_BUCKET covering n_frames, padded to the full cap (round 3 lifted
    FUSED_AUDIO_MAX_FRAMES by making the fused program bucket-aware)."""

    def _vocoder(self):
        from qwen3tts_tpu.config import TokenizerDecoderConfig
        from qwen3tts_tpu.models import vocoder as vc

        vcfg = TokenizerDecoderConfig(
            latent_dim=32, codebook_dim=16, codebook_size=64, decoder_dim=64,
            hidden_size=16, intermediate_size=32, num_hidden_layers=1,
            num_attention_heads=2, num_key_value_heads=2, head_dim=8,
            semantic_codebook_size=128,
        )
        vp = vc.init_vocoder_params(jax.random.PRNGKey(5), vcfg, jnp.float32)
        return vp, vcfg

    @pytest.mark.parametrize("max_steps,cap", [(5, 1024), (140, 1024)])
    def test_fused_equals_split_at_large_cap(self, params, max_steps, cap):
        from qwen3tts_tpu.models import vocoder as vc
        from qwen3tts_tpu.tts import _generate_and_decode

        talker, cpp = params
        vp, vcfg = self._vocoder()
        sampling = gen.SamplingConfig(0.9, 8, 1.0, 1.05, forbid_eos=True)
        prefill = (
            jax.random.normal(jax.random.PRNGKey(3), (1, 16, TINY_TALKER.hidden_size))
            * 0.1
        )
        trailing = jnp.zeros((8, TINY_TALKER.hidden_size))
        pad = jnp.zeros((TINY_TALKER.hidden_size,))
        cache_len = -(-(16 + cap) // 128) * 128
        common = dict(
            talker_cfg=TINY_TALKER, cp_cfg=TINY_CP, sampling=sampling,
            dec_cfg=vcfg, prefill_embeds=prefill, prefill_len=jnp.int32(12),
            trailing_embeds=trailing, trailing_len=jnp.int32(4),
            tts_pad_embed=pad,
            max_steps=jnp.int32(max_steps), max_frames=cap,
            key=jax.random.PRNGKey(7),
        )
        # production single-chip path: cache allocated inside the program
        codes, n, wav, lengths = _generate_and_decode(
            talker, cpp, vp, cache_len=cache_len, **common
        )
        # mesh path: externally-allocated cache — must match exactly
        codes_e, n_e, wav_e, _ = _generate_and_decode(
            talker, cpp, vp,
            cache=tk.make_cache(TINY_TALKER, 1, cache_len, jnp.float32),
            **common,
        )
        np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes_e))
        assert int(n) == int(n_e)
        np.testing.assert_array_equal(np.asarray(wav), np.asarray(wav_e))
        n = int(n)
        assert n == max_steps  # forbid_eos: runs to the cap
        up = vcfg.total_upsample
        assert wav.shape == (1, cap * up)  # padded to the full cap

        # split path: right-sized bucket decode of the same codes
        bucket = gen.pad_to_bucket(n)
        buf = jnp.zeros((1, bucket, TINY_CP.num_code_groups), jnp.int32)
        buf = buf.at[0, :n].set(codes[:n])
        wav_s, len_s = vc.decode(vp, vcfg, buf, jnp.int32(n))
        np.testing.assert_allclose(
            np.asarray(wav)[0, : n * up], np.asarray(wav_s)[0, : n * up],
            rtol=1e-5, atol=1e-5,
        )
        assert int(lengths[0]) == int(len_s[0])
