"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3tts_tpu.config import CodePredictorConfig, TalkerConfig
from qwen3tts_tpu.models import code_predictor as cp
from qwen3tts_tpu.models import generate as gen
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.parallel import mesh as pm

# kv_heads=8 so tp can go up to 8
TP_TALKER = TalkerConfig(
    vocab_size=3072,
    text_vocab_size=128,
    hidden_size=64,
    text_hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=16,
    num_key_value_heads=8,
    head_dim=8,
    code_predictor_config=CodePredictorConfig(
        vocab_size=2048,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=16,
        num_key_value_heads=8,
        head_dim=8,
    ),
)


@pytest.fixture(scope="module")
def params():
    tkp = tk.init_talker_params(jax.random.PRNGKey(0), TP_TALKER, jnp.float32)
    cpp = cp.init_code_predictor_params(
        jax.random.PRNGKey(1), TP_TALKER.code_predictor_config, TP_TALKER.hidden_size,
        jnp.float32,
    )
    return tkp, cpp


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_tp_forward_matches_single_device(params, tp):
    """TP-sharded talker forward == unsharded forward (XLA collectives)."""
    tkp, _ = params
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, TP_TALKER.hidden_size))
    cache = tk.make_cache(TP_TALKER, 1, 16, jnp.float32)
    h_ref, _ = tk.forward(tkp, TP_TALKER, x, cache, jnp.int32(0))

    mesh = pm.make_mesh(jax.devices()[:tp], tp=tp)
    tkp_s = pm.shard_talker(tkp, mesh)
    cache_s = pm.shard_cache(tk.make_cache(TP_TALKER, 1, 16, jnp.float32), mesh)
    with jax.set_mesh(mesh):
        h_tp, new_cache = jax.jit(
            lambda p, x, c: tk.forward(p, TP_TALKER, x, c, jnp.int32(0))
        )(tkp_s, x, cache_s)
    np.testing.assert_allclose(np.asarray(h_tp), np.asarray(h_ref), atol=2e-4)
    # cache sharding preserved on output
    assert new_cache.k.shape == cache.k.shape


def test_dp_tp_mesh_generation(params):
    """Full fused generation under a (dp=2, tp=4) mesh runs and matches
    frame count of the single-device run."""
    tkp, cpp = params
    mesh = pm.make_mesh(jax.devices(), tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    h = TP_TALKER.hidden_size
    prefill = jax.random.normal(jax.random.PRNGKey(3), (1, 8, h)) * 0.1
    trailing = jnp.zeros((4, h))
    sampling = gen.SamplingConfig(0.0, 0, 1.0, 1.0)

    def run(tkp_, cpp_, cache):
        return gen.generate_codes(
            tkp_, cpp_, talker_cfg=TP_TALKER,
            cp_cfg=TP_TALKER.code_predictor_config, sampling=sampling,
            prefill_embeds=prefill, prefill_len=jnp.int32(8),
            trailing_embeds=trailing, trailing_len=jnp.int32(4),
            tts_pad_embed=jnp.zeros((h,)), cache=cache,
            max_steps=jnp.int32(4), max_frames=8, key=jax.random.PRNGKey(0),
        )

    ref = run(tkp, cpp, tk.make_cache(TP_TALKER, 1, 32, jnp.float32))

    tkp_s = pm.shard_talker(tkp, mesh)
    cpp_s = pm.shard_cp(cpp, mesh)
    cache_s = pm.shard_cache(tk.make_cache(TP_TALKER, 1, 32, jnp.float32), mesh)
    with jax.set_mesh(mesh):
        out = run(tkp_s, cpp_s, cache_s)
    assert int(out.n_frames) == int(ref.n_frames)
    np.testing.assert_array_equal(np.asarray(out.codes), np.asarray(ref.codes))


def test_shard_specs_cover_all_leaves(params):
    """Every param leaf gets a sharding spec (no silent replication gaps)."""
    tkp, cpp = params
    jax.tree.map(
        lambda x, s: None,
        tkp,
        pm.talker_param_specs(tkp),
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
    )
    jax.tree.map(
        lambda x, s: None,
        cpp,
        pm.cp_param_specs(cpp),
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
    )


class TestPublicMeshAPI:
    """TP sharding through the public Qwen3TTSModel surface (VERDICT r1 #9)."""

    @pytest.fixture(scope="class")
    def ckpt_dir(self, tmp_path_factory):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from synthetic_ckpt import write_checkpoint

        return write_checkpoint(str(tmp_path_factory.mktemp("tp_ckpt")))

    def _model(self, ckpt_dir, mesh=None, quantize=None):
        from qwen3tts_tpu.tts import Qwen3TTSModel
        from synthetic_ckpt import StubTokenizer

        m = Qwen3TTSModel.from_pretrained(
            ckpt_dir, dtype=jnp.float32, mesh=mesh, quantize=quantize
        )
        m.tokenizer = StubTokenizer()
        return m

    def test_generate_under_tp_mesh_matches_unsharded(self, ckpt_dir):
        ref = self._model(ckpt_dir).generate(
            "Mesh parity", speaker="Aiden", temperature=0.0, max_tokens=5, seed=0
        )
        mesh = pm.make_mesh(jax.devices(), tp=4)
        m = self._model(ckpt_dir, mesh=mesh)
        out = m.generate(
            "Mesh parity", speaker="Aiden", temperature=0.0, max_tokens=5, seed=0
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-2)

    def test_stream_under_mesh(self, ckpt_dir):
        mesh = pm.make_mesh(jax.devices(), tp=2)
        m = self._model(ckpt_dir, mesh=mesh)
        events = list(
            m.generate_stream("Mesh stream", speaker="Aiden", max_tokens=5,
                              seed=1, audio_chunk_frames=2)
        )
        kinds = [type(e).__name__ for e in events]
        assert kinds[-2:] == ["InfoEvent", "AudioEvent"]
        assert any(k == "TokenEvent" for k in kinds)

    def test_int8_under_mesh(self, ckpt_dir):
        from qwen3tts_tpu.ops.quant import Int8Linear

        mesh = pm.make_mesh(jax.devices(), tp=2)
        m = self._model(ckpt_dir, mesh=mesh, quantize="int8")
        assert isinstance(m.talker_params["layers"]["q_proj"], Int8Linear)
        audio = m.generate(
            "Int8 mesh", speaker="Aiden", temperature=0.0, max_tokens=4, seed=0
        )
        assert audio.shape[0] > 0 and np.isfinite(audio).all()

    def test_batch_under_dp_tp_mesh(self, ckpt_dir):
        mesh = pm.make_mesh(jax.devices(), tp=4)  # dp=2, tp=4
        m = self._model(ckpt_dir, mesh=mesh)
        outs = m.generate_batch(
            ["One", "Two"], speakers=["Aiden", "Vivian"], max_tokens=4, seed=2
        )
        assert len(outs) == 2


class TestMeshKernelEquality:
    """Mesh path vs megakernel path numerics (VERDICT r2 item 4).

    The megakernels run single-device (a mesh routes decode through the
    sharded XLA path), so serving may mix paths: single-chip replicas on
    the kernels, a TP deployment on XLA collectives. This pins the two
    paths to the same numbers: a TP-sharded XLA decode step equals the
    fused whole-step Pallas kernel (interpret mode) on the same weights.
    """

    CFG = TalkerConfig(
        vocab_size=512,
        text_vocab_size=128,
        hidden_size=128,
        text_hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=128,  # kernel requires D=128; tp up to NKV=2
    )

    def test_tp_xla_step_equals_kernel_step(self):
        from qwen3tts_tpu.ops.rope import mrope_cos_sin
        from qwen3tts_tpu.ops.norms import rms_norm
        from qwen3tts_tpu.ops.talker_kernel import step_supported, talker_decode_step

        cfg = self.CFG
        pos, t_max = 21, 128
        params = tk.init_talker_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        fused = dict(params)
        fused["layers"] = tk.fuse_layer_projections(params["layers"])
        assert step_supported(
            {**fused, "layers": {**fused["layers"]}}, cfg
        ) is False  # dense f32 is not a kernel layout; interpret call is explicit

        H = cfg.hidden_size
        cache = tk.make_cache(cfg, 1, t_max, jnp.float32)
        prefill = jax.random.normal(jax.random.PRNGKey(3), (1, pos, H)) * 0.2
        _, cache = tk.forward(params, cfg, prefill, cache, jnp.int32(0))
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 1, H)) * 0.2

        # kernel path (single device, fused bf16-style dense layout)
        fused_bf16 = dict(fused)
        fused_bf16["layers"] = {
            k: (v.astype(jnp.bfloat16) if k in
                ("qkv_proj", "o_proj", "gate_up_proj", "down_proj") else v)
            for k, v in fused["layers"].items()
        }
        positions = jnp.full((1, 1), pos, jnp.int32)
        cos, sin = mrope_cos_sin(
            positions, cfg.head_dim, cfg.rope_theta, cfg.mrope_section, jnp.float32
        )
        h_k, _, _ = talker_decode_step(
            fused_bf16, cfg, x.astype(jnp.bfloat16),
            cache.k.astype(jnp.bfloat16), cache.v.astype(jnp.bfloat16),
            jnp.int32(pos), cos, sin, mode="bf16", interpret=True,
        )
        h_k = rms_norm(h_k.astype(jnp.float32), params["norm"], cfg.rms_norm_eps)

        # mesh path (tp=2 sharded XLA step on the same weights)
        mesh = pm.make_mesh(jax.devices()[:2], tp=2)
        tkp_s = pm.shard_talker(params, mesh)
        cache_s = pm.shard_cache(tk.make_cache(cfg, 1, t_max, jnp.float32), mesh)
        with jax.set_mesh(mesh):
            _, cache_s = jax.jit(
                lambda p, e, c: tk.forward(p, cfg, e, c, jnp.int32(0))
            )(tkp_s, prefill, cache_s)
            h_tp, _ = jax.jit(
                lambda p, e, c: tk.forward(p, cfg, e, c, jnp.int32(pos))
            )(tkp_s, x, cache_s)
        h_tp = rms_norm(h_tp[:, 0], params["norm"], cfg.rms_norm_eps)

        # bf16 kernel vs f32 XLA: agreement bounded by bf16 rounding
        scale = np.abs(np.asarray(h_tp)).max() + 1e-6
        diff = np.abs(np.asarray(h_k) - np.asarray(h_tp)).max() / scale
        assert diff < 0.02, f"mesh path vs kernel path diverged: {diff}"


class TestDpShardMap:
    """dp scale-out of the fused batch decode (parallel/dp.py).

    shard_map over "dp" runs the UNMODIFIED single-chip batch program per
    device shard. Oracle: a dp=4 mesh run must bit-match four direct
    per-shard `generate_codes_batch` runs with the same folded keys (f32
    on CPU -> exact, same local shapes so no batch-rounding caveat).
    """

    def test_dp_batch_matches_per_shard(self, params):
        from qwen3tts_tpu.models import batch_generate as bg
        from qwen3tts_tpu.parallel.dp import generate_codes_batch_dp

        tkp, cpp = params
        cfg, cpc = TP_TALKER, TP_TALKER.code_predictor_config
        B, dp, H = 8, 4, cfg.hidden_size
        sampling = gen.SamplingConfig(
            temperature=0.9, top_k=50, top_p=1.0, repetition_penalty=1.05
        )
        key = jax.random.PRNGKey(11)
        pe = jax.random.normal(jax.random.PRNGKey(3), (B, 16, H), jnp.float32) * 0.2
        pl = jnp.asarray([16, 12, 9, 16, 7, 13, 16, 10], jnp.int32)
        te = jax.random.normal(jax.random.PRNGKey(4), (B, 8, H), jnp.float32) * 0.2
        tl = jnp.asarray([8, 3, 0, 5, 8, 2, 6, 1], jnp.int32)
        pad = jnp.zeros((H,), jnp.float32)
        max_steps = jnp.asarray([10, 6, 12, 12, 4, 9, 12, 7], jnp.int32)
        max_frames = 12
        mesh = pm.make_mesh(jax.devices()[:dp], tp=1)
        got = generate_codes_batch_dp(
            tkp, cpp, mesh=mesh, talker_cfg=cfg, cp_cfg=cpc, sampling=sampling,
            prefill_embeds=pe, prefill_lens=pl, trailing_embeds=te,
            trailing_lens=tl, tts_pad_embed=pad,
            cache=tk.make_cache(cfg, B, 128, jnp.float32),
            max_steps=max_steps, max_frames=max_frames, key=key,
        )
        for s in range(dp):
            lo, hi = s * (B // dp), (s + 1) * (B // dp)
            exp = bg.generate_codes_batch(
                tkp, cpp, talker_cfg=cfg, cp_cfg=cpc, sampling=sampling,
                prefill_embeds=pe[lo:hi], prefill_lens=pl[lo:hi],
                trailing_embeds=te[lo:hi], trailing_lens=tl[lo:hi],
                tts_pad_embed=pad,
                cache=tk.make_cache(cfg, B // dp, 128, jnp.float32),
                max_steps=max_steps[lo:hi], max_frames=max_frames,
                key=jax.random.fold_in(key, s),
            )
            np.testing.assert_array_equal(
                np.asarray(got.codes[lo:hi]), np.asarray(exp.codes)
            )
            np.testing.assert_array_equal(
                np.asarray(got.n_frames[lo:hi]), np.asarray(exp.n_frames)
            )
            np.testing.assert_array_equal(
                np.asarray(got.tokens[lo:hi]), np.asarray(exp.tokens)
            )

    def test_dp_requires_tp1(self):
        from qwen3tts_tpu.parallel.dp import dp_size

        with pytest.raises(ValueError, match="tp=1 mesh"):
            dp_size(pm.make_mesh(jax.devices()[:4], tp=2))
        assert dp_size(pm.make_mesh(jax.devices()[:4], tp=1)) == 4

    def test_pallas_kernel_under_shard_map(self):
        """pallas_call composes with shard_map: the fused talker step in
        interpret mode, shard_map'd over dp=2, bit-matches direct per-shard
        kernel calls (local shapes are identical, so bf16 rounding is too).
        On hardware this is exactly how the megakernels engage under a dp
        mesh — per-device local shapes, no mesh visible to the kernel."""
        from jax.sharding import PartitionSpec as P

        from qwen3tts_tpu.ops.rope import mrope_cos_sin
        from qwen3tts_tpu.ops.talker_kernel import talker_decode_step

        cfg = TestMeshKernelEquality.CFG
        B, dp, pos, t_max = 4, 2, 21, 128
        H = cfg.hidden_size
        params = tk.init_talker_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        fused = dict(params)
        fused["layers"] = tk.fuse_layer_projections(params["layers"])
        fused["layers"] = {
            k: (v.astype(jnp.bfloat16) if k in
                ("qkv_proj", "o_proj", "gate_up_proj", "down_proj") else v)
            for k, v in fused["layers"].items()
        }

        cache = tk.make_cache(cfg, B, t_max, jnp.float32)
        prefill = jax.random.normal(jax.random.PRNGKey(3), (B, pos, H)) * 0.2
        _, cache = tk.forward(params, cfg, prefill, cache, jnp.int32(0))
        x = (jax.random.normal(jax.random.PRNGKey(5), (B, 1, H)) * 0.2).astype(
            jnp.bfloat16
        )
        k_c = cache.k.astype(jnp.bfloat16)
        v_c = cache.v.astype(jnp.bfloat16)
        offs = jnp.full((B,), pos, jnp.int32)
        cos, sin = mrope_cos_sin(
            jnp.full((B, 1), pos, jnp.int32), cfg.head_dim, cfg.rope_theta,
            cfg.mrope_section, jnp.float32,
        )

        def step(xx, kk, vv, oo, cc, ss):
            h, _, _ = talker_decode_step(
                fused, cfg, xx, kk, vv, oo, cc, ss, mode="bf16", interpret=True
            )
            return h

        mesh = pm.make_mesh(jax.devices()[:dp], tp=1)
        sharded = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P("dp"), P(None, "dp"), P(None, "dp"), P("dp"),
                      P("dp"), P("dp")),
            out_specs=P("dp"), check_vma=False,
        )
        got = np.asarray(sharded(x, k_c, v_c, offs, cos, sin))
        for s in range(dp):
            lo, hi = s * (B // dp), (s + 1) * (B // dp)
            exp = step(x[lo:hi], k_c[:, lo:hi], v_c[:, lo:hi], offs[lo:hi],
                       cos[lo:hi], sin[lo:hi])
            np.testing.assert_array_equal(got[lo:hi], np.asarray(exp))


class TestPublicDpAPI:
    """generate_batch(dp_mesh=) — the public dp scale-out surface."""

    @pytest.fixture(scope="class")
    def ckpt_dir(self, tmp_path_factory):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from synthetic_ckpt import write_checkpoint

        return write_checkpoint(str(tmp_path_factory.mktemp("dp_ckpt")))

    def _model(self, ckpt_dir, mesh=None):
        from qwen3tts_tpu.tts import Qwen3TTSModel
        from synthetic_ckpt import StubTokenizer

        m = Qwen3TTSModel.from_pretrained(ckpt_dir, dtype=jnp.float32, mesh=mesh)
        m.tokenizer = StubTokenizer()
        return m

    def test_generate_batch_dp_mesh(self, ckpt_dir):
        from qwen3tts_tpu.tts import Qwen3TTSError

        m = self._model(ckpt_dir)
        mesh = pm.make_mesh(jax.devices()[:2], tp=1)
        outs = m.generate_batch(
            ["One here", "Two there"], speakers=["Aiden", "Vivian"],
            max_tokens=4, seed=2, dp_mesh=mesh,
        )
        assert len(outs) == 2
        assert all(np.isfinite(a).all() for a in outs)
        with pytest.raises(Qwen3TTSError, match="not divisible"):
            m.generate_batch(
                ["a", "b", "c"], speakers=["Aiden"] * 3, max_tokens=4,
                dp_mesh=mesh,
            )
        m_tp = self._model(ckpt_dir, mesh=mesh)
        with pytest.raises(Qwen3TTSError, match="without"):
            m_tp.generate_batch(
                ["a", "b"], speakers=["Aiden"] * 2, max_tokens=4, dp_mesh=mesh
            )


class TestDpContinuous:
    """Continuous batching under dp (parallel/dp.py): prefill_start /
    generate_chunk / admit_slot shard_map'd with the distributed carry.
    Oracle: the dp=2 pipeline (prefill -> chunk -> admit into shard 1 ->
    chunk) bit-matches the same pipeline composed per shard with the same
    folded keys (f32 CPU, same local shapes -> exact)."""

    def test_dp_pipeline_matches_per_shard(self, params):
        from qwen3tts_tpu.models import batch_generate as bg
        from qwen3tts_tpu.parallel import dp as pdp

        tkp, cpp = params
        cfg, cpc = TP_TALKER, TP_TALKER.code_predictor_config
        B, ndp, H = 4, 2, cfg.hidden_size
        lb = B // ndp
        sampling = gen.SamplingConfig(
            temperature=0.9, top_k=50, top_p=1.0, repetition_penalty=1.05
        )
        common = dict(talker_cfg=cfg, cp_cfg=cpc, sampling=sampling)
        key_pref, key_admit = jax.random.PRNGKey(21), jax.random.PRNGKey(22)
        pe = jax.random.normal(jax.random.PRNGKey(3), (B, 16, H), jnp.float32) * 0.2
        pl = jnp.asarray([16, 12, 9, 13], jnp.int32)
        te = jax.random.normal(jax.random.PRNGKey(4), (B, 8, H), jnp.float32) * 0.2
        tl = jnp.asarray([8, 3, 5, 2], jnp.int32)
        pad = jnp.zeros((H,), jnp.float32)
        max_steps = jnp.full((B,), 6, jnp.int32)
        max_frames = 8
        slot = 3  # owned by shard 1 (local slot 1)
        admit_pe = jax.random.normal(jax.random.PRNGKey(5), (1, 16, H)) * 0.2
        admit_trow = jax.random.normal(jax.random.PRNGKey(6), (8, H)) * 0.2

        mesh = pm.make_mesh(jax.devices()[:ndp], tp=1)
        carry = pdp.prefill_start_batch_dp(
            tkp, cpp, mesh=mesh, **common, prefill_embeds=pe, prefill_lens=pl,
            trailing_embeds=te, trailing_lens=tl, tts_pad_embed=pad,
            cache=tk.make_cache(cfg, B, 128, jnp.float32),
            max_frames=max_frames, key=key_pref,
        )
        assert carry.step.shape == (ndp,)
        carry = pdp.generate_chunk_batch_dp(
            tkp, cpp, carry, mesh=mesh, **common, trailing_embeds=te,
            trailing_lens=tl, tts_pad_embed=pad, max_steps=max_steps,
            until_step=3,
        )
        assert pdp.global_step(carry) == 3
        carry, trailing_all = pdp.admit_slot_dp(
            tkp, cpp, carry, te, mesh=mesh, **common, slot=slot,
            prefill_embeds=admit_pe, prefill_len=11, trailing_row=admit_trow,
            trailing_len=6, tts_pad_embed=pad, key=key_admit,
        )
        carry = pdp.generate_chunk_batch_dp(
            tkp, cpp, carry, mesh=mesh, **common,
            trailing_embeds=trailing_all,
            trailing_lens=tl.at[slot].set(6), tts_pad_embed=pad,
            max_steps=max_steps, until_step=6,
        )

        # ---- per-shard oracle ----
        for s in range(ndp):
            lo, hi = s * lb, (s + 1) * lb
            c = bg.prefill_start_batch(
                tkp, cpp, **common, prefill_embeds=pe[lo:hi],
                prefill_lens=pl[lo:hi], trailing_embeds=te[lo:hi],
                trailing_lens=tl[lo:hi], tts_pad_embed=pad,
                cache=tk.make_cache(cfg, lb, 128, jnp.float32),
                max_frames=max_frames, key=jax.random.fold_in(key_pref, s),
            )
            tr = te[lo:hi]
            c = bg.generate_chunk_batch(
                tkp, cpp, c, **common, trailing_embeds=tr,
                trailing_lens=tl[lo:hi], tts_pad_embed=pad,
                max_steps=max_steps[lo:hi], until_step=jnp.int32(3),
            )
            if slot // lb == s:
                c, tr = bg.admit_slot(
                    tkp, cpp, c, tr, **common,
                    slot=jnp.int32(slot - s * lb), prefill_embeds=admit_pe,
                    prefill_len=jnp.int32(11), trailing_row=admit_trow,
                    trailing_len=jnp.int32(6), tts_pad_embed=pad,
                    key=jax.random.fold_in(key_admit, s),
                )
            c = bg.generate_chunk_batch(
                tkp, cpp, c, **common, trailing_embeds=tr,
                trailing_lens=tl[lo:hi].at[slot - s * lb if slot // lb == s else 0]
                .set(6) if slot // lb == s else tl[lo:hi],
                tts_pad_embed=pad, max_steps=max_steps[lo:hi],
                until_step=jnp.int32(6),
            )
            np.testing.assert_array_equal(
                np.asarray(carry.codes[lo:hi]), np.asarray(c.codes)
            )
            np.testing.assert_array_equal(
                np.asarray(carry.tokens[lo:hi]), np.asarray(c.tokens)
            )
            np.testing.assert_array_equal(
                np.asarray(carry.frames[lo:hi]), np.asarray(c.frames)
            )
            np.testing.assert_array_equal(
                np.asarray(carry.steps[lo:hi]), np.asarray(c.steps)
            )
            np.testing.assert_array_equal(
                np.asarray(carry.done[lo:hi]), np.asarray(c.done)
            )
            assert int(carry.step[s]) == int(c.step)


def test_dp_with_int8_params():
    """Int8Linear pytree leaves (q + scale) replicate cleanly through the
    shard_map in_specs prefix — the serving config the dp path actually
    deploys (weight-only int8). XLA decode inside the shard (kernel gates
    are platform-gated off on CPU), greedy so results are key-free: the
    dp=2 run must bit-match per-shard runs."""
    from qwen3tts_tpu.models import batch_generate as bg
    from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
    from qwen3tts_tpu.parallel.dp import generate_codes_batch_dp

    cfg, cpc = TP_TALKER, TP_TALKER.code_predictor_config
    tkp = quantize_decode_params_int8(
        tk.init_talker_params(jax.random.PRNGKey(0), cfg, jnp.float32),
        "codec_head",
    )
    cpp = quantize_decode_params_int8(
        cp.init_code_predictor_params(
            jax.random.PRNGKey(1), cpc, cfg.hidden_size, jnp.float32
        ),
        "lm_head",
    )
    B, ndp, H = 4, 2, cfg.hidden_size
    greedy = gen.SamplingConfig(
        temperature=0.0, top_k=0, top_p=1.0, repetition_penalty=1.0
    )
    pe = jax.random.normal(jax.random.PRNGKey(3), (B, 16, H), jnp.float32) * 0.2
    pl = jnp.asarray([16, 12, 9, 13], jnp.int32)
    te = jax.random.normal(jax.random.PRNGKey(4), (B, 8, H), jnp.float32) * 0.2
    tl = jnp.asarray([8, 3, 5, 2], jnp.int32)
    pad = jnp.zeros((H,), jnp.float32)
    kw = dict(
        talker_cfg=cfg, cp_cfg=cpc, sampling=greedy, tts_pad_embed=pad,
        max_frames=6, key=jax.random.PRNGKey(9),
    )
    mesh = pm.make_mesh(jax.devices()[:ndp], tp=1)
    got = generate_codes_batch_dp(
        tkp, cpp, mesh=mesh, prefill_embeds=pe, prefill_lens=pl,
        trailing_embeds=te, trailing_lens=tl,
        cache=tk.make_cache(cfg, B, 128, jnp.float32),
        max_steps=jnp.full((B,), 5, jnp.int32), **kw,
    )
    for s in range(ndp):
        lo, hi = s * (B // ndp), (s + 1) * (B // ndp)
        exp = bg.generate_codes_batch(
            tkp, cpp, prefill_embeds=pe[lo:hi], prefill_lens=pl[lo:hi],
            trailing_embeds=te[lo:hi], trailing_lens=tl[lo:hi],
            cache=tk.make_cache(cfg, B // ndp, 128, jnp.float32),
            max_steps=jnp.full((B // ndp,), 5, jnp.int32),
            **{**kw, "key": jax.random.fold_in(kw["key"], s)},
        )
        np.testing.assert_array_equal(
            np.asarray(got.codes[lo:hi]), np.asarray(exp.codes)
        )
        np.testing.assert_array_equal(
            np.asarray(got.n_frames[lo:hi]), np.asarray(exp.n_frames)
        )
