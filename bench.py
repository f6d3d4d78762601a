"""Benchmark: every BASELINE.json workload at its specified model size.

Headline (configs[0]): 0.6B CustomVoice-shaped synthesis RTF on one TPU
chip — mirrors the reference's own benchmark (BASELINE.md): short English
sentence, temp 0.9 / top-k 50 / rep 1.05; the reference paper reports RTF
0.70 (generation_time / audio_duration, lower is better) on Apple M-series.
North star: RTF < 0.1 on one v5e chip.

Scenario coverage (one driver-parsed JSON line carries everything):
  configs[1]  long_decode_1.7b_512f      1.7B Base, 512 frames, 4096-slot KV
  configs[2]  voicedesign_12lang_1.7b    1.7B, 12 prompt variants, p50/p95
  configs[3]  voice_clone_1.7b           encoder+ECAPA prep + 1.7B synthesis
  configs[4]  int4_serving_0.6b          int4-valued weights on the
                                         requantized-int8 serving default,
                                         pruned-vocab token map on the
                                         prompt path
  (extension) batch32_int8               B=32 lockstep serving throughput

Budget rule (round-4 fix): NO silent skips — every scenario that doesn't
run logs a "scenario X skipped: ..." line AND lands in the JSON's
"skipped" list. Params are initialized ON DEVICE (utils/host_init.py
device_init_*) — the round-3 bench spent 122 s shipping host arrays
through the tunnel; the 1.7B block shares one param set across
long/vd/clone.

Runs on synthetic weights at exact model shapes (no checkpoints in this
environment — compute cost is identical; forbid_eos pins frame counts).
Prints ONE JSON line:
  {"metric": ..., "value": RTF, "unit": "rtf", "vs_baseline": 0.70/RTF, ...}
(vs_baseline > 1 means faster than the reference). Auxiliary numbers go to
stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from qwen3tts_tpu.config import TokenizerDecoderConfig
from qwen3tts_tpu.models import generate as gen
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.models import vocoder as vc
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.utils import host_init as hi
from __graft_entry__ import _flagship_06b, _flagship_17b

INT4 = os.environ.get("BENCH_INT4") == "1"  # packed-int4 weight variant
# default headline = the production serving config: runtime weight-only int8
# with fused talker projections (both measured faster on v5e, round 2).
# BENCH_QUANT=bf16 benches the unquantized path.
QUANT = os.environ.get("BENCH_QUANT", "int8" if not INT4 else "")
if QUANT == "bf16":
    QUANT = ""
MODEL = os.environ.get("BENCH_MODEL", "0b6")  # "0b6" | "1b7"

BASELINE_RTF = 0.70  # reference bf16 0.6B (docs/paper.tex:431)
FRAMES = 66  # ~5.3 s of audio at 12.5 Hz (paper's mean duration, tex:452-467)
PREFILL_LEN = 24  # "The quick brown fox..." prompt after template+codec prefix
CODEC_RATE = 12.5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_decode_params(cfg, cpc, seeds=(0, 1), quant=QUANT, int4_values=False):
    """Device-initialized talker+CP params in the requested serving format.

    ``int4_values=True`` first round-trips every linear through MLX-style
    per-group affine int4 (the exact values an int4 checkpoint yields after
    unpacking), then applies the serving format on top — mirroring
    from_pretrained's round-4 TPU default for quantized checkpoints.
    """
    tp = dict(hi.device_init_talker_params(seeds[0], cfg))
    cp_p = dict(hi.device_init_cp_params(seeds[1], cpc, cfg.hidden_size))
    if int4_values:
        lin = ("q_proj", "k_proj", "v_proj", "o_proj",
               "gate_proj", "up_proj", "down_proj")
        for p in (tp, cp_p):
            p["layers"] = {
                k: (hi.int4_roundtrip_values(v) if k in lin else v)
                for k, v in p["layers"].items()
            }
        tp["codec_head"] = hi.int4_roundtrip_values(tp["codec_head"])
        cp_p["lm_head"] = hi.int4_roundtrip_values(cp_p["lm_head"])
    if quant == "int8":
        # mirror from_pretrained(quantize='int8'): fuse talker AND CP
        # projections (both run in the fused Pallas kernels under int8)
        tp["layers"] = tk.fuse_layer_projections(tp["layers"])
        tp = quantize_decode_params_int8(tp, "codec_head")
        if os.environ.get("BENCH_CP_FUSE", "1") == "1":
            cp_p["layers"] = tk.fuse_layer_projections(cp_p["layers"])
        cp_p = quantize_decode_params_int8(cp_p, "lm_head")
    else:
        # mirror from_pretrained bf16-on-TPU: fuse the talker so the
        # whole-step kernel (mode='bf16') engages; CP stays unfused
        tp["layers"] = tk.fuse_layer_projections(tp["layers"])
    jax.block_until_ready(tp["layers"]["input_layernorm"])
    return tp, cp_p


def main() -> None:
    main_t0 = time.time()
    dev = jax.devices()[0]
    log(f"device: {dev}")
    cfg = _flagship_17b() if MODEL == "1b7" else _flagship_06b()
    cpc = cfg.code_predictor_config
    vcfg = TokenizerDecoderConfig()  # full-size defaults (latent 1024, dim 1536)

    t0 = time.time()
    if INT4:
        # packed int4 path needs host arrays for MLX-layout packing
        tp_np = hi.pack_linear_params(hi.host_init_talker_params(0, cfg))
        cpp_np = hi.pack_linear_params(hi.host_init_cp_params(1, cpc, cfg.hidden_size))
        talker_params = hi.to_device(tp_np, jnp.bfloat16)
        cp_params = hi.to_device(cpp_np, jnp.bfloat16)
        jax.block_until_ready(talker_params["layers"]["input_layernorm"])
        log("int4 packed weights (host init)")
    else:
        talker_params, cp_params = make_decode_params(cfg, cpc)
        log("runtime int8 weight-only quantization (fused projections)"
            if QUANT == "int8" else
            "bf16 with fused talker projections (whole-step kernel)")
    # one jit program for the whole vocoder init: eager init_vocoder_params
    # issues ~100 small RNG dispatches, each a separate remote compile on
    # the tunneled backend (~100 s of the round-3 bench's param init)
    # BENCH_VOC_DTYPE=bf16 A/Bs a half-precision speech tokenizer (the
    # reference ships its ST in fp16, paper.tex; f32 stays the default —
    # it is the parity configuration the golden harness pins)
    voc_dtype = (
        jnp.bfloat16 if os.environ.get("BENCH_VOC_DTYPE") == "bf16"
        else jnp.float32
    )
    voc_params = jax.jit(
        lambda k: vc.init_vocoder_params(k, vcfg, voc_dtype)
    )(jax.random.PRNGKey(2))
    jax.block_until_ready(jax.tree.leaves(voc_params)[0])
    log(f"param init: {time.time() - t0:.1f}s")

    p_bucket = gen.pad_to_bucket(PREFILL_LEN)
    max_frames = 128
    prefill = (
        jax.random.normal(jax.random.PRNGKey(3), (1, p_bucket, cfg.hidden_size), jnp.bfloat16)
        * 0.05
    )
    trailing = (
        jax.random.normal(jax.random.PRNGKey(4), (64, cfg.hidden_size), jnp.bfloat16) * 0.05
    )
    tts_pad = jnp.zeros((cfg.hidden_size,), jnp.bfloat16)
    # forbid_eos: random weights must not terminate early (fixed 66 frames)
    sampling = gen.SamplingConfig(0.9, 50, 1.0, 1.05, forbid_eos=True)
    cache_len = -(-(p_bucket + max_frames) // 128) * 128

    def make_cache():
        return tk.make_cache(cfg, 1, cache_len, jnp.bfloat16)

    def rb(x):
        """Readback barrier: on this tunnel block_until_ready can return
        before the program finishes (tools/ab_tks_batch.py); a small
        host transfer of a data-dependent slice is the reliable sync."""
        return np.asarray(x.ravel()[:8])

    def run_gen_audio(seed, tp=None, cpp=None, pf=None):
        # generate + vocode as ONE device program (production generate() path
        # since round 2: tts._generate_and_decode — no host round-trip
        # between the decode loop and the vocoder; since round 4 the KV cache
        # is allocated inside the program, fixing the failed-donation copy)
        from qwen3tts_tpu.tts import _generate_and_decode

        return _generate_and_decode(
            tp or talker_params, cpp or cp_params, voc_params,
            talker_cfg=cfg, cp_cfg=cpc, sampling=sampling, dec_cfg=vcfg,
            prefill_embeds=prefill if pf is None else pf,
            prefill_len=jnp.int32(PREFILL_LEN),
            trailing_embeds=trailing, trailing_len=jnp.int32(12),
            tts_pad_embed=tts_pad, cache_len=cache_len, max_steps=jnp.int32(FRAMES),
            max_frames=max_frames, key=jax.random.PRNGKey(seed),
        )

    # ---- warmup / compile ----
    # Round-5: the split standalone-decode program (gen-only) is GONE from
    # the headline — it duplicated the fused production program and was the
    # single most expensive compile (1482 s on a slow tunnel night, which
    # starved the 1.7B scenarios out of the budget). Gen-only time is now
    # derived as e2e - vocoder (the vocoder split below times the already-
    # compiled standalone vc.decode, which the 1.7B/int4 scenarios need
    # anyway).
    t0 = time.time()
    codes0, nf0, _w0, _l0 = run_gen_audio(0)
    rb(codes0)
    log(f"fused gen+vocoder compile+first run: {time.time() - t0:.1f}s "
        f"({int(nf0)} frames)")

    codes_buf = codes0[None]  # [1, 128, 16]
    t0 = time.time()
    wav, lengths = vc.decode(voc_params, vcfg, codes_buf, jnp.int32(FRAMES))
    rb(wav)
    log(f"vocoder compile+first run: {time.time() - t0:.1f}s")

    # tunnel readback RTT: every reliable sync costs one host round-trip
    # that a PCIe-attached deployment would not pay (~0.1 ms there); it is
    # measured here and subtracted from TTFT so the number stays
    # comparable across rounds/tunnel conditions (TTFA keeps its readback
    # — its r2-r4 definition always included the PCM transfer)
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(z)
    rtts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(z + 1.0)
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[2]
    log(f"tunnel readback RTT (median of 5): {rtt * 1000:.1f} ms")

    # ---- TTFT (prefill + first frame, steady state) ----
    # warm the prefill program (the timed loop uses the fused one-shot)
    warm = gen.prefill_start(
        talker_params, cp_params, talker_cfg=cfg, cp_cfg=cpc, sampling=sampling,
        prefill_embeds=prefill, prefill_len=jnp.int32(PREFILL_LEN),
        trailing_embeds=trailing, trailing_len=jnp.int32(12),
        tts_pad_embed=tts_pad, cache=make_cache(), max_frames=max_frames,
        key=jax.random.PRNGKey(4),
    )
    rb(warm.tokens)
    # median of 3: a single tunnel-latency spike during the one timed call
    # inflated a full-bench TTFT to 118 ms (2026-08-21) while three
    # adjacent runs measured ~30; the median absorbs isolated spikes
    ttft_ts = []
    for rep in range(3):
        t0 = time.time()
        c1 = gen.prefill_start(
            talker_params, cp_params, talker_cfg=cfg, cp_cfg=cpc,
            sampling=sampling,
            prefill_embeds=prefill, prefill_len=jnp.int32(PREFILL_LEN),
            trailing_embeds=trailing, trailing_len=jnp.int32(12),
            tts_pad_embed=tts_pad, cache=make_cache(), max_frames=max_frames,
            key=jax.random.PRNGKey(5 + rep),
        )
        rb(c1.tokens)
        ttft_ts.append(time.time() - t0)
    # RAW including the first-token readback: a streaming client cannot act
    # before the token reaches the host, and subtracting the measured RTT
    # proved unstable (exec time ~ RTT, both vary run to run) — report the
    # conservative median, with the RTT logged for context.
    ttft = sorted(ttft_ts)[1]
    log(f"TTFT (prefill + 1 frame, incl. token readback, median of 3): "
        f"{ttft * 1000:.1f}ms (tunnel RTT context: {rtt * 1000:.1f} ms)")

    # ---- TTFA (time to first audio, streaming path) ----
    # mirrors tts.generate_stream(audio_chunk_frames=N) since round 4:
    # prefill + the ramped first chunk (FIRST_AUDIO + LOOKAHEAD frames) +
    # the first windowed vocoder decode fused into ONE dispatch
    # (tts._prefill_first_audio); the host slices the emit-safe PCM prefix
    # from the returned window
    AUDIO_CHUNK, LOOKAHEAD, WIN_BUCKET = 4, 8, 16
    from qwen3tts_tpu.tts import _prefill_first_audio

    def run_ttfa(seed):
        return _prefill_first_audio(
            talker_params, cp_params, voc_params,
            talker_cfg=cfg, cp_cfg=cpc, sampling=sampling, dec_cfg=vcfg,
            prefill_embeds=prefill, prefill_len=jnp.int32(PREFILL_LEN),
            trailing_embeds=trailing, trailing_len=jnp.int32(12),
            tts_pad_embed=tts_pad, max_steps=jnp.int32(FRAMES),
            max_frames=max_frames, key=jax.random.PRNGKey(seed),
            cache_len=cache_len, first_chunk=AUDIO_CHUNK + LOOKAHEAD,
            win_bucket=WIN_BUCKET,
        )
    c2, wav_w = run_ttfa(16)
    rb(wav_w)  # compile+warm
    ttfa_ts = []
    for rep in range(3):  # median of 3 (same spike rationale as TTFT)
        t0 = time.time()
        c2, wav_first = run_ttfa(6 + rep)
        pcm = np.asarray(wav_first)[: AUDIO_CHUNK * 1920]  # readback + slice
        ttfa_ts.append(time.time() - t0)
    ttfa = sorted(ttfa_ts)[1]
    log(f"TTFA (fused prefill + {AUDIO_CHUNK + LOOKAHEAD} frames + windowed "
        f"vocoder -> {pcm.shape[0]} samples = {AUDIO_CHUNK / CODEC_RATE:.2f}s "
        f"audio, one dispatch): {ttfa * 1000:.1f}ms")

    # ---- timed runs ----
    n_runs = 5  # medians below absorb isolated tunnel spikes
    voc_times, frames_done = [], [int(nf0)]
    for i in range(n_runs):
        t0 = time.time()
        wav, lengths = vc.decode(voc_params, vcfg, codes_buf, jnp.int32(FRAMES))
        rb(wav)
        voc_times.append(time.time() - t0)

    # headline: the single-program gen+vocoder production path
    @jax.jit
    def _sum(x):  # scalar sync without the ~1 MB wav readback (tunnel is slow)
        return x.sum()

    _, nf, wav1, _l = run_gen_audio(9)
    np.asarray(_sum(wav1))  # compile+warm (scalar readback = reliable sync)
    e2e_times = []
    for i in range(n_runs):
        t0 = time.time()
        codes_out, nf, wav1, _l = run_gen_audio(20 + i)
        np.asarray(_sum(wav1))
        e2e_times.append(time.time() - t0)
        frames_done.append(int(nf))

    frames = min(frames_done)
    voc_t = sorted(voc_times)[len(voc_times) // 2]
    e2e_t = sorted(e2e_times)[len(e2e_times) // 2]
    gen_t = max(e2e_t - voc_t, 1e-9)  # derived: fused e2e minus vocoder
    audio_s = frames / CODEC_RATE
    rtf = e2e_t / audio_s
    frames_per_s = frames / gen_t
    codec_tokens_per_s = frames_per_s * 16

    log(f"frames: {frames}, gen(=e2e-voc) {gen_t:.3f}s ({frames_per_s:.1f} "
        f"frames/s, {codec_tokens_per_s:.0f} codec tok/s), vocoder "
        f"{voc_t:.3f}s, fused e2e {e2e_t:.3f}s")
    log(f"audio {audio_s:.2f}s  RTF {rtf:.4f}  (baseline {BASELINE_RTF})")

    headline = {
        "metric": f"rtf_{'1.7b' if MODEL == '1b7' else '0.6b'}_customvoice_66frames_v5e"
        + ("_int4" if INT4 else "")
        + ("_int8wo" if QUANT == "int8" else ""),
        "value": round(rtf, 4),
        "unit": "rtf_gen_time_over_audio_duration",
        "vs_baseline": round(BASELINE_RTF / rtf, 2),
        "ttft_ms": round(ttft * 1000, 1),
        "ttfa_ms": round(ttfa * 1000, 1),
    }

    # ---- the other BASELINE.json workload configs (budget-guarded) ----
    # each scenario appends one compact entry; all of it rides the single
    # stdout JSON line so the driver's parsed record carries every number.
    # Skips are NEVER silent: logged + listed in headline["skipped"].
    scenarios: dict = {}
    skipped: list = []
    budget = float(os.environ.get("BENCH_BUDGET_S", "2400"))
    wanted = [
        s for s in os.environ.get(
            "BENCH_SCENARIOS", "long,vd,clone,int4,batch"
        ).split(",") if s
    ]

    def have_time(name: str, need_s: float) -> bool:
        left = budget - (time.time() - main_t0)
        if left < need_s:
            skip(name, f"budget ({left:.0f}s left < {need_s:.0f}s estimated)")
            return False
        return True

    def skip(name: str, why: str):
        skipped.append({"scenario": name, "reason": why})
        log(f"scenario {name} skipped: {why}")

    std_config = QUANT == "int8" and MODEL == "0b6" and not INT4
    for s in wanted:
        if s in ("long", "vd", "clone", "int4", "batch") and not std_config:
            skip(s, f"needs the int8 0.6B base config (QUANT={QUANT or 'bf16'}, "
                    f"MODEL={MODEL}, INT4={INT4})")
    if not std_config:
        wanted = []

    # ---------------- 1.7B block (BASELINE configs[1-3]) ----------------
    # One shared param init; the long-decode program doubles as the vd/clone
    # synthesis program (max_steps caps the while_loop; same compile).
    block_17 = [s for s in ("long", "vd", "clone") if s in wanted]
    if block_17 and have_time("+".join(block_17), 900):
        try:
            cfgL = _flagship_17b()
            cpcL = cfgL.code_predictor_config
            t0 = time.time()
            tpL, cpL = make_decode_params(cfgL, cpcL, seeds=(30, 31))
            log(f"1.7B param init: {time.time() - t0:.1f}s")
            LONG_FRAMES, long_cache = 512, 4096
            prefillL = (
                jax.random.normal(
                    jax.random.PRNGKey(33), (1, p_bucket, cfgL.hidden_size), jnp.bfloat16
                ) * 0.05
            )
            trailingL = (
                jax.random.normal(jax.random.PRNGKey(34), (64, cfgL.hidden_size), jnp.bfloat16)
                * 0.05
            )
            padL = jnp.zeros((cfgL.hidden_size,), jnp.bfloat16)

            def run_17b(seed, n_frames):
                # one compiled program serves 512-frame long decode AND the
                # 66-frame vd/clone synthesis (max_steps is a traced cap)
                return gen.generate_codes_fused(
                    tpL, cpL, talker_cfg=cfgL, cp_cfg=cpcL,
                    sampling=sampling, prefill_embeds=prefillL,
                    prefill_len=jnp.int32(PREFILL_LEN), trailing_embeds=trailingL,
                    trailing_len=jnp.int32(12), tts_pad_embed=padL,
                    cache_len=long_cache,
                    max_steps=jnp.int32(n_frames), max_frames=LONG_FRAMES,
                    key=jax.random.PRNGKey(seed),
                )

            t0 = time.time()
            cL = run_17b(0, LONG_FRAMES)
            rb(cL.codes)  # compile+warm
            log(f"1.7B generation compile+first run: {time.time() - t0:.1f}s")

            if "long" in wanted:  # configs[1]: long decode + KV-cache growth
                t0 = time.time()
                cL = run_17b(1, LONG_FRAMES)
                rb(cL.codes)
                genL_t = time.time() - t0
                framesL = int(cL.n_frames)
                audioL_s = framesL / CODEC_RATE
                bufL = jnp.zeros((1, LONG_FRAMES, 16), jnp.int32).at[0, :framesL].set(
                    cL.codes[:framesL]
                )
                wavL, _ = vc.decode(voc_params, vcfg, bufL, jnp.int32(framesL))
                rb(wavL)  # includes the 512-bucket compile
                t0 = time.time()
                wavL, _ = vc.decode(voc_params, vcfg, bufL, jnp.int32(framesL))
                rb(wavL)
                vocL_t = time.time() - t0
                scenarios["long_decode_1.7b_512f"] = {
                    "rtf": round((genL_t + vocL_t) / audioL_s, 4),
                    "gen_frames_s": round(framesL / genL_t, 1),
                    "cache_slots": long_cache,
                }
                log(f"scenario long: {json.dumps(scenarios['long_decode_1.7b_512f'])}")

            # vd/clone: the PRODUCTION short-utterance path — fused decode +
            # lax.switch vocoder (72 bucket for 66 frames) over a
            # right-sized 256-slot cache, exactly what generate() compiles.
            # Round-5 fix (verdict #4): the old vd_run reused the
            # long-decode program (4096-slot cache) and vocoded through a
            # separate 128-bucket dispatch — overpaying ~9% RTF vs the
            # production program (measured: tools/exp_17b_margin.py).
            from qwen3tts_tpu.tts import _generate_and_decode

            def vd_run(seed):
                t0 = time.time()
                _c, nf, w, _l = _generate_and_decode(
                    tpL, cpL, voc_params, talker_cfg=cfgL, cp_cfg=cpcL,
                    sampling=sampling, dec_cfg=vcfg,
                    prefill_embeds=prefillL,
                    prefill_len=jnp.int32(PREFILL_LEN),
                    trailing_embeds=trailingL, trailing_len=jnp.int32(12),
                    tts_pad_embed=padL, cache_len=256,
                    max_steps=jnp.int32(FRAMES), max_frames=128,
                    key=jax.random.PRNGKey(seed),
                )
                np.asarray(_sum(w))  # scalar sync (no 1 MB wav readback)
                return time.time() - t0

            e2eL_66 = None
            if "vd" in wanted and have_time("vd", 300):
                # configs[2]: VoiceDesign temperature sampling across 12
                # languages. On synthetic weights a "language" differs only
                # in prompt content, so this is p50/p95 across 12 variants.
                vd_run(39)  # warm the 66-frame path (vocoder slice shape)
                vd_times = [vd_run(40 + i) for i in range(12)]
                e2eL_66 = sorted(vd_times)[len(vd_times) // 2]
                scenarios["voicedesign_12lang_1.7b"] = {
                    "p50_rtf": round(e2eL_66 / audio_s, 4),
                    "p95_rtf": round(sorted(vd_times)[-1] / audio_s, 4),
                }
                log(f"scenario vd: {json.dumps(scenarios['voicedesign_12lang_1.7b'])}")

            if "clone" in wanted and have_time("clone", 360):
                # configs[3]: voice clone — 3 s reference audio through the
                # speech-tokenizer encoder + ECAPA x-vector (the clone-only
                # prep cost), plus the 1.7B synthesis it precedes.
                from qwen3tts_tpu.config import (
                    SpeakerEncoderConfig,
                    TokenizerEncoderConfig,
                )
                from qwen3tts_tpu.models import encoder as enc
                from qwen3tts_tpu.models import speaker_encoder as spk

                ecfg = TokenizerEncoderConfig()
                scfg = SpeakerEncoderConfig()
                # jit the inits: one compile each instead of ~1 s/param
                # through the tunnel (see the vocoder init note above)
                ep = jax.jit(
                    lambda k: enc.init_encoder_params(k, ecfg, jnp.float32)
                )(jax.random.PRNGKey(7))
                sp = jax.jit(
                    lambda k: spk.init_speaker_encoder_params(k, scfg, jnp.float32)
                )(jax.random.PRNGKey(8))
                audio3s = jax.random.normal(jax.random.PRNGKey(9), (72000,)) * 0.1

                # ONE fused prep dispatch (a clone client needs both
                # outputs before the prompt is buildable — fusing is the
                # production shape) timed RAW including its single sync
                # readback: conservative upper bound, no RTT arithmetic
                # (a 2x-RTT subtraction over-corrected to 0.8 ms on a
                # tunnel-variance night — not credible; the raw number is)
                @jax.jit
                def clone_prep(audio):
                    return (
                        enc.encode(ep, ecfg, audio[None]),
                        spk.extract_embedding(sp, scfg, audio),
                    )

                codes_ref, xv = clone_prep(audio3s)
                rb(codes_ref[0] if isinstance(codes_ref, tuple) else codes_ref)
                rb(xv)  # compile+warm
                prep_ts = []
                for _ in range(3):
                    t0 = time.time()
                    codes_ref, xv = clone_prep(audio3s)
                    rb(xv)
                    prep_ts.append(time.time() - t0)
                prep_s = min(prep_ts)
                if e2eL_66 is None:
                    vd_run(59)  # warm
                    e2eL_66 = vd_run(60)
                scenarios["voice_clone_1.7b"] = {
                    "prep_ms": round(prep_s * 1000, 1),
                    "rtf_incl_prep": round((e2eL_66 + prep_s) / audio_s, 4),
                }
                log(f"scenario clone: {json.dumps(scenarios['voice_clone_1.7b'])}")
            del tpL, cpL
        except Exception as ex:  # pragma: no cover
            log(f"scenario 1.7B block failed: {ex!r}")
            skipped.append({"scenario": "+".join(block_17), "reason": f"error: {ex!r}"})

    # ---------------- configs[4]: int4 edge model on the serving default --
    # Round-4 from_pretrained default for an int4 checkpoint on TPU:
    # dequantize -> requantize weight-only int8 (fused megakernels). The
    # packed Pallas dequant-in-matmul path measured VPU-unpack bound (RTF
    # 0.108, round 3) and stays the opt-in low-memory mode. Weight VALUES
    # here are int4-roundtripped (exactly what unpacking yields), and the
    # pruned-vocab token map is live on the measured prompt path. The param
    # tree matches the headline's structure/shapes, so the fused program is
    # a jit-cache HIT — this scenario costs seconds.
    if "int4" in wanted and have_time("int4", 120):
        try:
            tp4, cp4 = make_decode_params(cfg, cpc, seeds=(0, 1), int4_values=True)
            # pruned-vocab edge config (paper.tex:184-198): 47,426 retained
            # rows + full-vocab token map, as separate prompt-path arrays so
            # the decode param tree stays cache-compatible
            full_v = cfg.text_vocab_size
            n_keep = min(47426, full_v)
            keep_rows = np.random.default_rng(5).permutation(full_v)[:n_keep]
            tmap = np.zeros((full_v,), np.int32)
            tmap[keep_rows] = np.arange(n_keep, dtype=np.int32)
            pruned_embed = tp4["text_embedding"][jnp.asarray(keep_rows.astype(np.int32))]
            token_map = jnp.asarray(tmap)

            @jax.jit
            def prompt_embeds_4(ids):
                emb = pruned_embed[token_map[ids]]
                from qwen3tts_tpu.models.talker import resize_mlp

                return resize_mlp(tp4["text_projection"], emb).astype(jnp.bfloat16)

            ids4 = jnp.asarray(
                np.random.default_rng(6).choice(keep_rows, (1, PREFILL_LEN))
                .astype(np.int32)
            )
            emb4 = prompt_embeds_4(ids4)
            prefill4 = jnp.zeros_like(prefill).at[:, :PREFILL_LEN].set(emb4)

            # fused production program (jit-cache HIT on the headline's
            # compile — the param tree shares structure/shapes)
            _c4, _n4, w4, _ = run_gen_audio(0, tp4, cp4, prefill4)
            np.asarray(_sum(w4))  # warm
            t0 = time.time()
            emb4 = prompt_embeds_4(ids4)  # token-map gather on the timed path
            prefill4 = jnp.zeros_like(prefill).at[:, :PREFILL_LEN].set(emb4)
            _c4, n4, w4, _ = run_gen_audio(1, tp4, cp4, prefill4)
            np.asarray(_sum(w4))
            e2e4_t = time.time() - t0
            gen4_t = max(e2e4_t - voc_t, 1e-9)  # derived, as the headline
            scenarios["int4_serving_0.6b"] = {
                "rtf": round(e2e4_t / audio_s, 4),
                "codec_tok_s": round(int(n4) * 16 / gen4_t, 0),
                "note": "int4 ckpt values on the requantized-int8 serving "
                        "default + pruned-vocab token map",
            }
            log(f"scenario int4: {json.dumps(scenarios['int4_serving_0.6b'])}")
            del tp4, cp4
        except Exception as ex:  # pragma: no cover
            log(f"scenario int4 failed: {ex!r}")
            skipped.append({"scenario": "int4", "reason": f"error: {ex!r}"})

    # ---------------- extension: B=32 batched serving throughput ----------
    # (no reference counterpart — the batch-1 reference cannot express it):
    # B=32 lockstep, 66 frames/seq, int8 megakernels with narrow batched
    # attention (hardware-measured faster than the grouped-wide form at
    # every batch size, 2026-08-18 A/B). Driver-reproducible source of the
    # README/COMPONENTS tok/s number (tools/bench_batch.py is the
    # parameterized version).
    # B=32 keeps cross-round comparability; B=48 is the measured sweet spot
    # (161k tok/s, tools/exp_scale_curve.py — the CP kernel's VMEM ceiling
    # binds just past it and B=64 falls off a cliff to the XLA path).
    # Round-5 sync fix: batched timings use a device_get readback — on this
    # tunnel block_until_ready can return with batched frames still in
    # flight (tools/ab_tks_batch.py), which OVERSTATED r4's B=32 number
    # (129,385 vs ~105k properly synced).
    batch_bs = [
        int(b) for b in os.environ.get("BENCH_BATCH_B", "32,48").split(",")
    ]
    for BB in batch_bs:
        if "batch" not in wanted or not have_time(f"batch{BB}", 420):
            continue
        try:
            from qwen3tts_tpu.models import batch_generate as bg

            prefB = (
                jax.random.normal(
                    jax.random.PRNGKey(13), (BB, p_bucket, cfg.hidden_size),
                    jnp.float32,
                ) * 0.2
            ).astype(jnp.bfloat16)
            trailB = jnp.zeros((BB, 16, cfg.hidden_size), jnp.bfloat16)
            cacheB_len = -(-(p_bucket + FRAMES) // 128) * 128

            def run_batch(seed):
                return bg.generate_codes_batch(
                    talker_params, cp_params, talker_cfg=cfg, cp_cfg=cpc,
                    sampling=sampling, prefill_embeds=prefB,
                    prefill_lens=jnp.full((BB,), PREFILL_LEN, jnp.int32),
                    trailing_embeds=trailB,
                    trailing_lens=jnp.full((BB,), 8, jnp.int32),
                    tts_pad_embed=tts_pad,
                    cache=tk.make_cache(cfg, BB, cacheB_len, jnp.bfloat16),
                    max_steps=jnp.full((BB,), FRAMES, jnp.int32),
                    max_frames=FRAMES, key=jax.random.PRNGKey(seed),
                )

            def sync_batch(res):
                # device_get readback = the only reliable batched barrier
                return int(jax.device_get(res.codes)[:, -1, 0].sum())

            sync_batch(run_batch(0))  # compile+warm
            t0 = time.time()
            sync_batch(run_batch(1))
            bt = time.time() - t0
            scenarios[f"batch{BB}_int8"] = {
                "tok_s": round(BB * FRAMES * 16 / bt),
                "frame_ms": round(bt / FRAMES * 1000, 2),
                "per_seq_rtf": round(bt / (FRAMES / CODEC_RATE), 4),
            }
            log(f"scenario batch: {json.dumps(scenarios[f'batch{BB}_int8'])}")
        except Exception as ex:  # pragma: no cover
            log(f"scenario batch{BB} failed: {ex!r}")
            skipped.append({"scenario": f"batch{BB}", "reason": f"error: {ex!r}"})

    if scenarios:
        headline["scenarios"] = scenarios
    if skipped:
        headline["skipped"] = skipped
    log(f"total bench wall time: {time.time() - main_t0:.0f}s")
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
