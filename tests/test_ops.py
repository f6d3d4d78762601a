"""Unit tests for core ops: RoPE/MRoPE, norms, sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.ops import norms, rope, sampling


class TestRope:
    def test_mrope_identical_streams_equals_standard_rope(self):
        """For TTS the 3 position streams are identical -> MRoPE == RoPE
        (reference Talker.swift:93-96: 2D positions broadcast to 3D)."""
        pos = jnp.arange(17, dtype=jnp.int32)[None]
        cos_m, sin_m = rope.mrope_cos_sin(pos, 128, 1e6, (24, 20, 20), jnp.float32)
        cos_s, sin_s = rope.rope_cos_sin(pos, 128, 1e6, jnp.float32)
        np.testing.assert_allclose(cos_m, cos_s, atol=1e-6)
        np.testing.assert_allclose(sin_m, sin_s, atol=1e-6)

    def test_mrope_interleave_pattern(self):
        """Interleave: i%3==1 -> H (i<60), i%3==2 -> W (i<60), else T
        (reference Talker.swift:49-82)."""
        h_mask, w_mask = rope.mrope_interleave_masks(64, (24, 20, 20))
        assert h_mask.sum() == 20 and w_mask.sum() == 20
        assert not h_mask[0] and h_mask[1] and w_mask[2] and not h_mask[2]
        # tail (i >= 60) is all T
        assert not h_mask[60:].any() and not w_mask[60:].any()
        # distinct streams produce a mixture
        pos3 = jnp.stack(
            [jnp.full((1, 4), 1), jnp.full((1, 4), 2), jnp.full((1, 4), 3)]
        ).astype(jnp.int32)
        cos, _ = rope.mrope_cos_sin(pos3, 128, 1e4, (24, 20, 20), jnp.float32)
        inv = rope.inv_freq(128, 1e4)
        np.testing.assert_allclose(cos[0, 0, 0], np.cos(1 * inv[0]), atol=1e-6)
        np.testing.assert_allclose(cos[0, 0, 1], np.cos(2 * inv[1]), atol=1e-6)
        np.testing.assert_allclose(cos[0, 0, 2], np.cos(3 * inv[2]), atol=1e-6)
        np.testing.assert_allclose(cos[0, 0, 63], np.cos(1 * inv[63]), atol=1e-6)

    def test_rotate_half(self):
        x = jnp.arange(8.0).reshape(1, 1, 1, 8)
        out = rope.rotate_half(x)
        np.testing.assert_allclose(
            np.asarray(out)[0, 0, 0], [-4, -5, -6, -7, 0, 1, 2, 3]
        )

    def test_apply_rotary_preserves_norm(self):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (1, 2, 5, 64))
        k = jax.random.normal(key, (1, 2, 5, 64))
        cos, sin = rope.rope_cos_sin(jnp.arange(5)[None], 64, 1e4, jnp.float32)
        q2, k2 = rope.apply_rotary(q, k, cos, sin)
        # rotation preserves per-pair norms -> overall vector norm
        np.testing.assert_allclose(
            jnp.linalg.norm(q, axis=-1), jnp.linalg.norm(q2, axis=-1), rtol=1e-5
        )


class TestNorms:
    def test_rms_norm_matches_numpy(self):
        x = np.random.RandomState(0).randn(2, 3, 16).astype(np.float32)
        w = np.random.RandomState(1).rand(16).astype(np.float32)
        got = norms.rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6)
        want = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * w
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_snake_beta(self):
        x = np.random.RandomState(0).randn(1, 8, 4).astype(np.float32)
        alpha = np.random.RandomState(1).randn(4).astype(np.float32) * 0.1
        beta = np.random.RandomState(2).randn(4).astype(np.float32) * 0.1
        got = norms.snake_beta(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta))
        a, b = np.exp(alpha), np.exp(beta)
        want = x + (1.0 / (b + 1e-9)) * np.sin(x * a) ** 2
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_gelu_tanh_close_to_exact(self):
        x = jnp.linspace(-3, 3, 101)
        np.testing.assert_allclose(
            norms.gelu_tanh(x), jax.nn.gelu(x, approximate=False), atol=3e-3
        )


class TestSampling:
    def test_greedy(self):
        logits = jnp.asarray([[0.1, 5.0, -1.0, 2.0]])
        tok = sampling.sample_token(jax.random.PRNGKey(0), logits, temperature=0.0)
        assert int(tok[0]) == 1

    def test_suppress_mask(self):
        mask = sampling.build_suppress_mask(3072, 2150)
        m = np.asarray(mask)
        assert not m[:2048].any()
        assert m[2048:].sum() == 1024 - 1 and not m[2150]

    def test_suppressed_never_sampled(self):
        logits = jnp.zeros((1, 8))
        mask = jnp.asarray([False, True, True, True, True, True, True, False])
        for i in range(20):
            tok = sampling.sample_token(
                jax.random.PRNGKey(i), logits, suppress_mask=mask, top_k=0
            )
            assert int(tok[0]) in (0, 7)

    def test_top_k_restricts_support(self):
        logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0]])
        for i in range(20):
            tok = sampling.sample_token(
                jax.random.PRNGKey(i), logits, top_k=2, temperature=1.0
            )
            assert int(tok[0]) in (3, 4)

    def test_top_p_restricts_support(self):
        logits = jnp.log(jnp.asarray([[0.05, 0.05, 0.4, 0.5]]))
        for i in range(30):
            tok = sampling.sample_token(
                jax.random.PRNGKey(i), logits, top_k=0, top_p=0.9, temperature=1.0
            )
            assert int(tok[0]) in (2, 3)

    def test_ref_exact_top_p_matches_reference_math(self):
        """ref_exact mode cumulates UNNORMALIZED exp(logits) against the
        absolute threshold 1-p (reference Qwen3.swift:92-117), which keeps a
        different set than proper nucleus when sum(exp) != 1."""
        # exp(logits) = [0.2, 0.3, 1.5]; ascending cumsum = [0.2, 0.5, 2.0]
        logits = jnp.log(jnp.asarray([[0.2, 0.3, 1.5]]))
        ref = np.asarray(sampling.apply_top_p(logits, 0.6, ref_exact=True))
        # threshold 1-p = 0.4: keep where cum > 0.4 -> ids 1 (cum 0.5) and 2
        assert np.isneginf(ref[0, 0]) and np.isfinite(ref[0, 1:]).all()
        # proper nucleus at p=0.6 keeps only id 2 (prob .75 >= .6 alone)
        fixed = np.asarray(sampling.apply_top_p(logits, 0.6))
        assert np.isneginf(fixed[0, :2]).all() and np.isfinite(fixed[0, 2])

    def test_repetition_penalty_matches_reference_math(self):
        """neg -> *p, pos -> /p on seen ids (reference Qwen3.swift:164-179)."""
        logits = jnp.asarray([[2.0, -2.0, 1.0]])
        seen = jnp.asarray([True, True, False])
        out = sampling.apply_repetition_penalty(logits, seen, 2.0)
        np.testing.assert_allclose(np.asarray(out)[0], [1.0, -4.0, 1.0])

    def test_eos_bypasses_topk(self):
        """EOS logit is restored after top-k/top-p (reference Qwen3.swift:187-207):
        with k=1 and a moderate EOS logit, EOS must still be sampleable."""
        logits = jnp.asarray([[10.0, 9.9, 0.0, 0.0]])  # eos = id 1
        hits = 0
        for i in range(200):
            tok = sampling.sample_token(
                jax.random.PRNGKey(i), logits, top_k=1, temperature=1.0, eos_token_id=1
            )
            hits += int(tok[0]) == 1
        assert hits > 30  # ~47% expected; 0 if EOS were filtered

    def test_batch_shape(self):
        logits = jnp.zeros((4, 16))
        tok = sampling.sample_token(jax.random.PRNGKey(0), logits)
        assert tok.shape == (4,) and tok.dtype == jnp.int32


class TestSampleTokenVec:
    """Per-row-parameter sampler (serving's per-request sampling mode):
    row b of sample_token_vec must follow sample_token_inner with row b's
    scalars (ops/sampling.py). Uniform rows + the same key are BIT-equal to
    the scalar batched sampler (identical filter values, identical
    categorical over the same [B, V] gumbel draw)."""

    V = 64

    def _logits(self, B, key=0):
        return jax.random.normal(jax.random.PRNGKey(key), (B, self.V)) * 3.0

    def test_uniform_rows_bit_match_scalar_batch(self):
        B = 5
        logits = self._logits(B)
        seen = jax.random.bernoulli(jax.random.PRNGKey(1), 0.3, (B, self.V))
        key = jax.random.PRNGKey(2)
        for top_p in (1.0, 0.9):
            a = sampling.sample_token_inner(
                key, logits, temperature=0.8, top_k=7, top_p=top_p,
                repetition_penalty=1.1, seen=seen, eos_token_id=3,
            )
            b = sampling.sample_token_vec(
                key, logits,
                temperature=jnp.full((B,), 0.8),
                top_k=jnp.full((B,), 7, jnp.int32),
                top_p=jnp.full((B,), top_p),
                repetition_penalty=jnp.full((B,), 1.1),
                seen=seen, eos_token_id=3,
            )
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_greedy_rows_match_scalar_greedy(self):
        """temperature <= 0 rows are argmax AFTER suppress+penalty, BEFORE
        top-k/top-p — exactly the scalar path's order."""
        B = 4
        logits = self._logits(B, key=3)
        seen = jax.random.bernoulli(jax.random.PRNGKey(4), 0.4, (B, self.V))
        out = sampling.sample_token_vec(
            jax.random.PRNGKey(5), logits,
            temperature=jnp.zeros((B,)),
            top_k=jnp.full((B,), 5, jnp.int32),
            top_p=jnp.full((B,), 0.5),
            repetition_penalty=jnp.full((B,), 1.3),
            seen=seen,
        )
        ref = sampling.sample_token_inner(
            jax.random.PRNGKey(5), logits, temperature=0.0, top_k=5, top_p=0.5,
            repetition_penalty=1.3, seen=seen,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_per_row_top_k_membership(self):
        """Each row's draws stay inside ITS OWN top-k set (+ EOS, which
        bypasses the filters) across many keys."""
        B = 3
        logits = self._logits(B, key=6)
        ks = jnp.asarray([1, 5, 20], jnp.int32)
        eos = 7
        allowed = []
        for b in range(B):
            top = np.argsort(-np.asarray(logits[b]))[: int(ks[b])]
            allowed.append(set(top.tolist()) | {eos})
        for i in range(60):
            toks = sampling.sample_token_vec(
                jax.random.PRNGKey(1000 + i), logits,
                temperature=jnp.full((B,), 1.0),
                top_k=ks, eos_token_id=eos,
            )
            for b in range(B):
                assert int(toks[b]) in allowed[b], (b, int(toks[b]))

    def test_top_k_one_equals_greedy(self):
        """top_k=1 with temperature > 0 must pick the post-penalty argmax —
        the same token a temperature<=0 row picks."""
        B = 2
        logits = self._logits(B, key=7)
        seen = jax.random.bernoulli(jax.random.PRNGKey(8), 0.4, (B, self.V))
        hot = sampling.sample_token_vec(
            jax.random.PRNGKey(9), logits,
            temperature=jnp.full((B,), 0.9),
            top_k=jnp.ones((B,), jnp.int32),
            repetition_penalty=jnp.full((B,), 1.2), seen=seen,
        )
        cold = sampling.sample_token_vec(
            jax.random.PRNGKey(10), logits,
            temperature=jnp.zeros((B,)),
            top_k=jnp.zeros((B,), jnp.int32),
            repetition_penalty=jnp.full((B,), 1.2), seen=seen,
        )
        np.testing.assert_array_equal(np.asarray(hot), np.asarray(cold))

    def test_disable_semantics(self):
        """top_k outside (0, V) and top_p outside (0, 1) disable the row's
        filter — matching the scalar sampler's guards."""
        B = 3
        logits = self._logits(B, key=11)
        key = jax.random.PRNGKey(12)
        a = sampling.sample_token_vec(
            key, logits,
            temperature=jnp.full((B,), 1.0),
            top_k=jnp.asarray([0, self.V, -3], jnp.int32),
            top_p=jnp.asarray([1.0, 0.0, 1.5]),
        )
        b = sampling.sample_token_inner(
            key, logits, temperature=1.0, top_k=0, top_p=1.0,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
