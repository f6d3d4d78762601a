"""Fused talker-step kernel vs the XLA scan-over-layers path.

The kernel (ops/talker_kernel.py) runs all L layers of a single decode
step as one Pallas grid program with double-buffered int8 weight
streaming and prefix-streaming flash attention. Here we prefill a real
cache through the XLA `forward`, then run ONE decode step through both
paths and compare the hidden output and the new k/v rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.config import TalkerConfig
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.ops.rope import mrope_cos_sin
from qwen3tts_tpu.ops.norms import rms_norm
from qwen3tts_tpu.ops.talker_kernel import step_supported, talker_decode_step


def _tiny_cfg(**kw):
    return TalkerConfig(
        vocab_size=512,
        hidden_size=256,
        text_hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=128,
        **kw,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    params = tk.init_talker_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    params["layers"] = tk.fuse_layer_projections(params["layers"])
    params = quantize_decode_params_int8(params, "codec_head")
    return cfg, params


def _run_both(cfg, params, pos, t_max, mode="wo_bf16"):
    """Prefill `pos` tokens through the XLA path, then one decode step
    through XLA and the kernel. Returns (h_xla, h_kernel, kv_xla, kv_kernel)."""
    H = cfg.hidden_size
    cache = tk.make_cache(cfg, 1, t_max, jnp.bfloat16)
    prefill = (
        jax.random.normal(jax.random.PRNGKey(3), (1, pos, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    _, cache = tk.forward(params, cfg, prefill, cache, jnp.int32(0))

    x = (
        jax.random.normal(jax.random.PRNGKey(5), (1, 1, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    offset = jnp.int32(pos)

    h_xla, cache_xla = tk.forward(params, cfg, x, cache, offset)

    positions = jnp.full((1, 1), pos, jnp.int32)
    cos, sin = mrope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, cfg.mrope_section, jnp.bfloat16
    )
    h_k, k_new, v_new = talker_decode_step(
        params, cfg, x, cache.k, cache.v, offset, cos, sin,
        mode=mode, interpret=True,
    )
    h_k = rms_norm(h_k, params["norm"], cfg.rms_norm_eps)

    kv_xla = (
        np.asarray(cache_xla.k[:, 0, :, pos, :], np.float32),
        np.asarray(cache_xla.v[:, 0, :, pos, :], np.float32),
    )
    kv_k = (
        np.asarray(k_new[:, 0], np.float32),
        np.asarray(v_new[:, 0], np.float32),
    )
    return (
        np.asarray(h_xla, np.float32),
        np.asarray(h_k, np.float32),
        kv_xla,
        kv_k,
    )


def test_step_supported(setup):
    cfg, params = setup
    assert step_supported(params, cfg)
    dense = tk.init_talker_params(jax.random.PRNGKey(1), cfg, jnp.bfloat16)
    assert not step_supported(dense, cfg)  # unfused, non-int8


# pos values cover: mid-first-block, exact block boundary, multi-block
@pytest.mark.parametrize("pos,t_max", [(37, 256), (128, 256), (130, 384)])
def test_decode_step_parity(setup, pos, t_max):
    cfg, params = setup
    h_xla, h_k, kv_xla, kv_k = _run_both(cfg, params, pos, t_max)
    scale = np.abs(h_xla).mean() + 1e-6
    rel = np.abs(h_k - h_xla).max() / scale
    assert rel < 0.15, f"hidden mismatch: scaled {rel:.4f} (pos={pos})"
    for a, b, name in (*zip(kv_xla, kv_k, ("k", "v")),):
        s = np.abs(a).mean() + 1e-6
        d = np.abs(a - b).max() / s
        assert d < 0.1, f"{name} row mismatch: scaled {d:.4f} (pos={pos})"


def test_decode_step_parity_bf16_dense(setup):
    """Dense bf16 fused layout (no quantization) through mode='bf16'."""
    cfg, _ = setup
    params = tk.init_talker_params(jax.random.PRNGKey(2), cfg, jnp.bfloat16)
    params["layers"] = tk.fuse_layer_projections(params["layers"])
    from qwen3tts_tpu.ops.talker_kernel import _layout

    assert _layout(params["layers"]) == "bf16"
    assert step_supported(params, cfg)
    h_xla, h_k, kv_xla, kv_k = _run_both(cfg, params, 37, 256, mode="bf16")
    scale = np.abs(h_xla).mean() + 1e-6
    rel = np.abs(h_k - h_xla).max() / scale
    assert rel < 0.15, f"hidden mismatch: scaled {rel:.4f} (pos={pos})"
    for a, b, name in (*zip(kv_xla, kv_k, ("k", "v")),):
        s = np.abs(a).mean() + 1e-6
        d = np.abs(a - b).max() / s
        assert d < 0.1, f"{name} row mismatch: scaled {d:.4f} (pos={pos})"


def test_decode_step_parity_dyn_int8(setup):
    cfg, params = setup
    h_xla, h_k, _, _ = _run_both(cfg, params, 37, 256, mode="dyn_int8")
    scale = np.abs(h_xla).mean() + 1e-6
    rel = np.abs(h_k - h_xla).max() / scale
    # activation quant adds ~int8 rounding noise per matvec
    assert rel < 0.6, f"hidden mismatch: scaled {rel:.4f}"


def _run_sample_mode(cfg, params, pos, t_max, temperature, seen_ids=(),
                     suppress_ids=(), rep=1.0, eos_id=-1, seed=(7, 13)):
    """One decode step in kernel sample mode; returns (h_k, code0, cache, x)."""
    H = cfg.hidden_size
    cache = tk.make_cache(cfg, 1, t_max, jnp.bfloat16)
    prefill = (
        jax.random.normal(jax.random.PRNGKey(3), (1, pos, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    _, cache = tk.forward(params, cfg, prefill, cache, jnp.int32(0))
    x = (
        jax.random.normal(jax.random.PRNGKey(5), (1, 1, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)

    V = params["codec_head"].q.shape[-1]
    seen = jnp.zeros((V,), bool)
    for i in seen_ids:
        seen = seen.at[i].set(True)
    supp = jnp.zeros((V,), bool)
    for i in suppress_ids:
        supp = supp.at[i].set(True)
    suppress_add = jnp.where(supp, jnp.float32(-1e30), jnp.float32(0.0))

    positions = jnp.full((1, 1), pos, jnp.int32)
    cos, sin = mrope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, cfg.mrope_section, jnp.bfloat16
    )
    h_k, k_new, v_new, code0 = talker_decode_step(
        params, cfg, x, cache.k, cache.v, jnp.int32(pos), cos, sin,
        interpret=True,
        sample=dict(temperature=temperature, top_k=8, rep_penalty=rep,
                    eos_id=eos_id),
        seed=jnp.asarray(seed, jnp.int32),
        suppress_add=suppress_add[None],
        seen=seen[None].astype(jnp.float32),
    )
    return h_k, code0, cache, x, seen, supp


def test_batched_decode_step_parity(setup):
    """B=2 kernel step with per-sequence offsets == XLA forward_batched_step."""
    cfg, params = setup
    H, B = cfg.hidden_size, 2
    cache = tk.make_cache(cfg, B, 256, jnp.bfloat16)
    pre = (
        jax.random.normal(jax.random.PRNGKey(3), (B, 90, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    _, cache = tk.forward(params, cfg, pre, cache, jnp.int32(0))
    offsets = jnp.array([37, 90], jnp.int32)  # row 0 sees only its prefix
    x = (
        jax.random.normal(jax.random.PRNGKey(5), (B, 1, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)

    h_x, cache_x = tk.forward_batched_step(params, cfg, x, cache, offsets)

    cos, sin = mrope_cos_sin(
        offsets[:, None], cfg.head_dim, cfg.rope_theta, cfg.mrope_section,
        jnp.bfloat16,
    )
    h_k, k_new, v_new = talker_decode_step(
        params, cfg, x, cache.k, cache.v, offsets, cos, sin, interpret=True
    )
    h_k = rms_norm(h_k, params["norm"], cfg.rms_norm_eps)

    hx = np.asarray(h_x, np.float32)
    hk = np.asarray(h_k, np.float32)
    rel = np.abs(hk - hx).max() / (np.abs(hx).mean() + 1e-6)
    assert rel < 0.15, f"batched hidden mismatch: scaled {rel:.4f}"
    for b in range(B):
        kx = np.asarray(cache_x.k[:, b, :, int(offsets[b]), :], np.float32)
        kk = np.asarray(k_new[:, b], np.float32)
        d = np.abs(kk - kx).max() / (np.abs(kx).mean() + 1e-6)
        assert d < 0.1, f"k row mismatch seq {b}: scaled {d:.4f}"


def test_sample_mode_greedy_matches_xla(setup):
    """Greedy in-kernel head+sampler == XLA codec_logits + argmax, and the
    returned hidden is the POST-norm hidden."""
    cfg, params = setup
    seen_ids = (3, 100)
    h_k, code0, cache, x, seen, _ = _run_sample_mode(
        cfg, params, 37, 256, temperature=0.0, seen_ids=seen_ids, rep=1.05
    )
    # XLA reference
    h_xla, _ = tk.forward(params, cfg, x, cache, jnp.int32(37))
    logits = tk.codec_logits(params, h_xla)[:, 0]
    from qwen3tts_tpu.ops.sampling import sample_token_inner

    ref = sample_token_inner(
        jax.random.PRNGKey(0), logits, temperature=0.0, top_k=8, top_p=1.0,
        repetition_penalty=1.05, seen=seen,
    )
    hx = np.asarray(h_xla[:, 0], np.float32)
    hk = np.asarray(h_k[:, 0], np.float32)
    rel = np.abs(hk - hx).max() / (np.abs(hx).mean() + 1e-6)
    assert rel < 0.15, f"post-norm hidden mismatch: {rel:.4f}"
    # greedy pick must match unless the top-2 XLA gap is inside bf16 noise
    lx = np.asarray(logits[0], np.float32)
    top2 = np.sort(lx)[-2:]
    if (top2[1] - top2[0]) / (np.std(lx) + 1e-6) > 0.05:
        assert int(code0[0]) == int(ref[0])


def test_sample_mode_respects_suppress_and_seed(setup):
    cfg, params = setup
    V = params["codec_head"].q.shape[-1]
    # suppress all but 16 ids: the sample must land in the allowed set
    allowed = list(range(32, 48))
    supp_ids = [i for i in range(V) if i not in allowed]
    try:
        _, c1, *_ = _run_sample_mode(
            cfg, params, 37, 256, temperature=0.9, suppress_ids=supp_ids,
            seed=(7, 13),
        )
        _, c2, *_ = _run_sample_mode(
            cfg, params, 37, 256, temperature=0.9, suppress_ids=supp_ids,
            seed=(99, 1234),
        )
    except Exception as e:  # pragma: no cover - interpret-mode PRNG support
        pytest.skip(f"interpret-mode PRNG unsupported here: {e}")
    assert int(c1[0]) in allowed
    assert int(c2[0]) in allowed


@pytest.mark.parametrize("B,offsets", [(4, [37, 90, 5, 64]),
                                       (6, [37, 90, 5, 64, 1, 113]),
                                       (8, [37, 90, 5, 64, 1, 128, 90, 33]),
                                       # B=16 -> SG=8, TWO groups: covers the
                                       # multi-group plane indexing/masking
                                       # that single-group B<=8 cannot (the
                                       # serving B=32 config runs 4 groups)
                                       (16, [37, 90, 5, 64, 1, 128, 90, 33,
                                             2, 77, 130, 11, 56, 99, 3, 120])])
def test_batched_wide_attention_parity(setup, monkeypatch, B, offsets):
    """Grouped-wide attention (opt-in via QWEN3TTS_TK_WIDE_SG since the
    2026-08-18 hardware A/B showed narrow faster at every batch size):
    kernel step with per-sequence offsets == XLA forward_batched_step,
    and == the narrow kernel form on the same inputs."""
    from qwen3tts_tpu.ops.talker_kernel import _pick_wide_sg

    assert _pick_wide_sg(B) == 0  # narrow is the default everywhere
    monkeypatch.setenv("QWEN3TTS_TK_WIDE_SG", str(min(B, 8)))
    assert _pick_wide_sg(B) == min(B, 8)
    cfg, params = setup
    H = cfg.hidden_size
    cache = tk.make_cache(cfg, B, 256, jnp.bfloat16)
    pre = (
        jax.random.normal(jax.random.PRNGKey(3), (B, 130, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    _, cache = tk.forward(params, cfg, pre, cache, jnp.int32(0))
    offs = jnp.array(offsets, jnp.int32)
    x = (
        jax.random.normal(jax.random.PRNGKey(5), (B, 1, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    cos, sin = mrope_cos_sin(
        offs[:, None], cfg.head_dim, cfg.rope_theta, cfg.mrope_section,
        jnp.bfloat16,
    )

    h_x, _ = tk.forward_batched_step(params, cfg, x, cache, offs)
    h_w, k_w, v_w = talker_decode_step(
        params, cfg, x, cache.k, cache.v, offs, cos, sin, interpret=True
    )
    monkeypatch.setenv("QWEN3TTS_TK_WIDE_SG", "-1")
    h_n, k_n, v_n = talker_decode_step(
        params, cfg, x, cache.k, cache.v, offs, cos, sin, interpret=True
    )

    hx = np.asarray(h_x, np.float32)
    hw = np.asarray(rms_norm(h_w, params["norm"], cfg.rms_norm_eps), np.float32)
    hn = np.asarray(rms_norm(h_n, params["norm"], cfg.rms_norm_eps), np.float32)
    rel = np.abs(hw - hx).max() / (np.abs(hx).mean() + 1e-6)
    assert rel < 0.15, f"wide vs XLA mismatch: scaled {rel:.4f}"
    # wide and narrow are the same f32 math modulo summation order
    reln = np.abs(hw - hn).max() / (np.abs(hn).mean() + 1e-6)
    assert reln < 0.05, f"wide vs narrow kernel mismatch: scaled {reln:.4f}"
    np.testing.assert_array_equal(np.asarray(k_w), np.asarray(k_n))
    np.testing.assert_array_equal(np.asarray(v_w), np.asarray(v_n))


def test_two_layers_per_grid_step_parity(monkeypatch):
    """lps=2 (even layer count): kernel == XLA step and == the lps=1
    kernel within bf16 rounding (same math; the one-trace two-layer body
    fuses/rounds differently than two grid steps, so bit-exactness does
    not hold — measured 1-2 ulp)."""
    cfg = TalkerConfig(
        vocab_size=512,
        hidden_size=256,
        text_hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=128,
    )
    params = tk.init_talker_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    params["layers"] = tk.fuse_layer_projections(params["layers"])
    params = quantize_decode_params_int8(params, "codec_head")
    from qwen3tts_tpu.ops.talker_kernel import _pick_lps, _shapes

    s = _shapes(cfg)
    monkeypatch.setenv("QWEN3TTS_TK_LPS", "2")
    assert _pick_lps(4, 1, s, "int8", 128, 0) == 2
    assert _pick_lps(3, 1, s, "int8", 128, 0) == 1  # odd L stays single

    H = cfg.hidden_size
    cache = tk.make_cache(cfg, 1, 256, jnp.bfloat16)
    pre = (
        jax.random.normal(jax.random.PRNGKey(3), (1, 37, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    _, cache = tk.forward(params, cfg, pre, cache, jnp.int32(0))
    x = (
        jax.random.normal(jax.random.PRNGKey(5), (1, 1, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    cos, sin = mrope_cos_sin(
        jnp.full((1, 1), 37, jnp.int32), cfg.head_dim, cfg.rope_theta,
        cfg.mrope_section, jnp.bfloat16,
    )
    h_xla, _ = tk.forward(params, cfg, x, cache, jnp.int32(37))

    h2, k2, v2 = talker_decode_step(
        params, cfg, x, cache.k, cache.v, jnp.int32(37), cos, sin,
        interpret=True,
    )
    monkeypatch.setenv("QWEN3TTS_TK_LPS", "1")
    h1, k1, v1 = talker_decode_step(
        params, cfg, x, cache.k, cache.v, jnp.int32(37), cos, sin,
        interpret=True,
    )
    for a, b, nm in ((h2, h1, "h"), (k2, k1, "k"), (v2, v1, "v")):
        an, bn = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.abs(an - bn).max() / (np.abs(bn).mean() + 1e-6)
        assert rel < 0.03, f"lps=2 vs lps=1 {nm} mismatch: scaled {rel:.4f}"
    hx = np.asarray(rms_norm(h_xla, params["norm"], cfg.rms_norm_eps), np.float32)[:, 0]
    hk = np.asarray(rms_norm(h2, params["norm"], cfg.rms_norm_eps), np.float32)[:, 0]
    rel = np.abs(hk - hx).max() / (np.abs(hx).mean() + 1e-6)
    assert rel < 0.15, f"lps=2 vs XLA mismatch: scaled {rel:.4f}"


def test_pick_block_t_tracks_cache_and_batch():
    """KV stream block sizing: ~T/8 target, VMEM budget at large B, 64-row
    floor only when 128 rows would blow the scratch budget."""
    from qwen3tts_tpu.ops.talker_kernel import _pick_block_t

    assert _pick_block_t(256, 1, 8, 128) == 128   # short cache: tight blocks
    assert _pick_block_t(4096, 1, 8, 128) == 512  # long cache: amortize DMA
    assert _pick_block_t(2048, 1, 8, 128) == 256
    assert _pick_block_t(256, 32, 8, 128) == 128  # budget caps large B
    assert _pick_block_t(256, 64, 8, 128) == 64   # B=64: 128 rows > 34 MB
    assert _pick_block_t(4096, 16, 8, 128) == 256  # budget admits 256, not 512


def test_batched_sample_mode_greedy_matches_xla(setup):
    """B=3 kernel step with the in-kernel row-parallel head+sampler:
    greedy picks match the XLA batched step + per-row sampler, per-row
    ``seen`` drives the repetition penalty independently, and the hidden
    comes back post-final-norm."""
    cfg, params = setup
    from qwen3tts_tpu.ops.sampling import sample_token_inner

    H, B, t_max = cfg.hidden_size, 3, 256
    V = params["codec_head"].q.shape[-1]
    cache = tk.make_cache(cfg, B, t_max, jnp.bfloat16)
    pre = (
        jax.random.normal(jax.random.PRNGKey(3), (B, 90, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    _, cache = tk.forward(params, cfg, pre, cache, jnp.int32(0))
    offsets = jnp.array([37, 64, 90], jnp.int32)
    x = (
        jax.random.normal(jax.random.PRNGKey(5), (B, 1, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    seen = jnp.zeros((B, V), bool)
    seen = seen.at[0, 3].set(True).at[1, 100].set(True).at[2, 7].set(True)
    suppress_add = jnp.zeros((V,), jnp.float32)

    cos, sin = mrope_cos_sin(
        offsets[:, None], cfg.head_dim, cfg.rope_theta, cfg.mrope_section,
        jnp.bfloat16,
    )
    h_k, k_new, v_new, code0 = talker_decode_step(
        params, cfg, x, cache.k, cache.v, offsets, cos, sin, interpret=True,
        sample=dict(temperature=0.0, top_k=8, rep_penalty=1.05, eos_id=-1),
        seed=jnp.asarray([7, 13], jnp.int32),
        suppress_add=suppress_add[None],
        seen=seen.astype(jnp.float32),
    )

    # XLA reference: batched step, then the (batch-general) sampler per row
    h_x, _ = tk.forward_batched_step(params, cfg, x, cache, offsets)
    logits = tk.codec_logits(params, h_x)[:, 0]  # [B, V]
    ref = sample_token_inner(
        jax.random.PRNGKey(0), logits, temperature=0.0, top_k=8, top_p=1.0,
        repetition_penalty=1.05, seen=seen,
    )

    hx = np.asarray(h_x[:, 0], np.float32)
    hk = np.asarray(h_k[:, 0], np.float32)
    rel = np.abs(hk - hx).max() / (np.abs(hx).mean() + 1e-6)
    assert rel < 0.15, f"post-norm hidden mismatch: {rel:.4f}"
    lx = np.asarray(logits, np.float32)
    for b in range(B):
        top2 = np.sort(lx[b])[-2:]
        if (top2[1] - top2[0]) / (np.std(lx[b]) + 1e-6) > 0.05:
            assert int(code0[b]) == int(ref[b]), f"row {b} greedy pick"


def test_batched_sample_mode_respects_suppress(setup):
    """Sampled (T>0) batched kernel: every row's code lands in the shared
    allowed set."""
    cfg, params = setup
    H, B, t_max = cfg.hidden_size, 2, 256
    V = params["codec_head"].q.shape[-1]
    cache = tk.make_cache(cfg, B, t_max, jnp.bfloat16)
    pre = (
        jax.random.normal(jax.random.PRNGKey(3), (B, 50, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    _, cache = tk.forward(params, cfg, pre, cache, jnp.int32(0))
    offsets = jnp.array([33, 50], jnp.int32)
    x = (
        jax.random.normal(jax.random.PRNGKey(5), (B, 1, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    allowed = list(range(32, 48))
    supp = jnp.ones((V,), bool)
    for i in allowed:
        supp = supp.at[i].set(False)
    suppress_add = jnp.where(supp, jnp.float32(-1e30), jnp.float32(0.0))
    cos, sin = mrope_cos_sin(
        offsets[:, None], cfg.head_dim, cfg.rope_theta, cfg.mrope_section,
        jnp.bfloat16,
    )
    try:
        _, _, _, code0 = talker_decode_step(
            params, cfg, x, cache.k, cache.v, offsets, cos, sin, interpret=True,
            sample=dict(temperature=0.9, top_k=8, rep_penalty=1.0, eos_id=-1),
            seed=jnp.asarray([21, 34], jnp.int32),
            suppress_add=suppress_add[None],
            seen=jnp.zeros((B, V), jnp.float32),
        )
    except Exception as e:  # pragma: no cover - interpret-mode PRNG support
        pytest.skip(f"interpret-mode PRNG unsupported here: {e}")
    for b in range(B):
        assert int(code0[b]) in allowed, f"row {b} escaped the allowed set"


def test_int8_kv_cache_parity_and_quality(setup):
    """int8 KV cache (KVCacheQ): kernel step == XLA step on the SAME
    quantized cache (both dequantize identically), and the quantized XLA
    path stays close to the bf16 XLA path (int8 rounding only)."""
    cfg, params = setup
    H, pos, t_max = cfg.hidden_size, 130, 384
    prefill = (
        jax.random.normal(jax.random.PRNGKey(3), (1, pos, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    x = (
        jax.random.normal(jax.random.PRNGKey(5), (1, 1, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    offset = jnp.int32(pos)

    cache_q = tk.make_cache(cfg, 1, t_max, quantized=True)
    assert cache_q.quantized and cache_q.k.dtype == jnp.int8
    _, cache_q = tk.forward(params, cfg, prefill, cache_q, jnp.int32(0))
    h_q, cache_q2 = tk.forward(params, cfg, x, cache_q, offset)

    cache_b = tk.make_cache(cfg, 1, t_max, jnp.bfloat16)
    _, cache_b = tk.forward(params, cfg, prefill, cache_b, jnp.int32(0))
    h_b, _ = tk.forward(params, cfg, x, cache_b, offset)

    # quality: int8 KV ~ bf16 KV (per-row scales -> sub-1% attention error)
    hq = np.asarray(h_q, np.float32)
    hb = np.asarray(h_b, np.float32)
    rel = np.abs(hq - hb).max() / (np.abs(hb).mean() + 1e-6)
    assert rel < 0.1, f"int8 KV vs bf16 KV: scaled {rel:.4f}"

    # parity: kernel on the same quantized cache == the XLA step above
    positions = jnp.full((1, 1), pos, jnp.int32)
    cos, sin = mrope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, cfg.mrope_section, jnp.bfloat16
    )
    h_k, k_new, v_new = talker_decode_step(
        params, cfg, x, cache_q.k, cache_q.v, offset, cos, sin,
        mode="wo_bf16", interpret=True,
        k_scale=cache_q.ks, v_scale=cache_q.vs,
    )
    h_k = rms_norm(h_k, params["norm"], cfg.rms_norm_eps)
    hk = np.asarray(h_k, np.float32)
    rel = np.abs(hk - hq).max() / (np.abs(hq).mean() + 1e-6)
    assert rel < 0.15, f"kernel vs XLA on int8 cache: scaled {rel:.4f}"
    # appended rows agree after dequantization (the kernel's k rows carry
    # bf16 rounding vs XLA's, so raw int8 codes may differ by +-1)
    kq, ks = tk.quantize_kv_rows(k_new)
    row_k = np.asarray(tk.dequantize_kv(kq, ks)[:, 0], np.float32)
    row_x = np.asarray(
        tk.dequantize_kv(
            cache_q2.k[:, 0, :, pos, :], cache_q2.ks[:, 0, :, pos]
        ),
        np.float32,
    )
    d = np.abs(row_k - row_x).max() / (np.abs(row_x).mean() + 1e-6)
    assert d < 0.1, f"appended k rows: scaled {d:.4f}"


@pytest.mark.parametrize("B,offs_list", [
    (2, [37, 90]),
    (4, [37, 90, 5, 64]),
    # SG=8, two groups: multi-group wide planes WITH per-row scale folding
    (16, [37, 90, 5, 64, 1, 88, 90, 33, 2, 77, 85, 11, 56, 89, 3, 70]),
])
def test_int8_kv_batched_step_parity(setup, B, offs_list):
    """Int8-KV kernel step with per-sequence offsets == XLA
    forward_batched_step on the same quantized cache (B=2 narrow form,
    B>=4 grouped-wide with the per-row scales folded into the wide
    score/prob planes; B=16 covers multi-group)."""
    cfg, params = setup
    H = cfg.hidden_size
    cache = tk.make_cache(cfg, B, 256, quantized=True)
    pre = (
        jax.random.normal(jax.random.PRNGKey(3), (B, 90, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)
    _, cache = tk.forward(params, cfg, pre, cache, jnp.int32(0))
    offsets = jnp.array(offs_list, jnp.int32)
    x = (
        jax.random.normal(jax.random.PRNGKey(5), (B, 1, H), jnp.float32) * 0.2
    ).astype(jnp.bfloat16)

    h_x, cache_x = tk.forward_batched_step(params, cfg, x, cache, offsets)

    cos, sin = mrope_cos_sin(
        offsets[:, None], cfg.head_dim, cfg.rope_theta, cfg.mrope_section,
        jnp.bfloat16,
    )
    h_k, k_new, v_new = talker_decode_step(
        params, cfg, x, cache.k, cache.v, offsets, cos, sin, interpret=True,
        k_scale=cache.ks, v_scale=cache.vs,
    )
    h_k = rms_norm(h_k, params["norm"], cfg.rms_norm_eps)

    hx = np.asarray(h_x, np.float32)
    hk = np.asarray(h_k, np.float32)
    rel = np.abs(hk - hx).max() / (np.abs(hx).mean() + 1e-6)
    assert rel < 0.15, f"batched int8-KV hidden mismatch: scaled {rel:.4f}"
    for b in range(B):
        kx = tk.dequantize_kv(
            cache_x.k[:, b, :, int(offsets[b]), :],
            cache_x.ks[:, b, :, int(offsets[b])],
        )
        kk = np.asarray(k_new[:, b], np.float32)
        d = np.abs(kk - np.asarray(kx, np.float32)).max() / (
            np.abs(np.asarray(kx, np.float32)).mean() + 1e-6
        )
        assert d < 0.1, f"k row mismatch seq {b}: scaled {d:.4f}"
