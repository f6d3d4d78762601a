"""Megakernels-inside-shard_map on the real chip (parallel/dp.py).

CPU tests pin the dp path's numerics (interpret mode + XLA path); the one
thing they cannot show is Mosaic compiling/executing the fused Pallas
kernels inside a shard_map body on hardware. A dp=1 mesh over the single
available chip exercises exactly that: same local shapes as the direct
single-chip run, so the greedy trajectories must match bit-for-bit.
"""
import sys, time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp, numpy as np

from qwen3tts_tpu.models import batch_generate as bg
from qwen3tts_tpu.models import code_predictor as cp
from qwen3tts_tpu.models import generate as gen
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.ops.quant import quantize_decode_params_int8
from qwen3tts_tpu.ops.talker_kernel import step_supported
from qwen3tts_tpu.parallel import mesh as pm
from qwen3tts_tpu.parallel.dp import generate_codes_batch_dp
from qwen3tts_tpu.utils import host_init as hi
from __graft_entry__ import _flagship_06b


def log(*a):
    print(*a, flush=True)


cfg = _flagship_06b()
cpc = cfg.code_predictor_config
t0 = time.time()
tp = dict(hi.to_device(hi.host_init_talker_params(0, cfg), jnp.bfloat16))
tp["layers"] = tk.fuse_layer_projections(tp["layers"])
tp = quantize_decode_params_int8(tp, "codec_head")
cpp = dict(hi.to_device(hi.host_init_cp_params(1, cpc, cfg.hidden_size), jnp.bfloat16))
cpp["layers"] = tk.fuse_layer_projections(cpp["layers"])
cpp = quantize_decode_params_int8(cpp, "lm_head")
jax.block_until_ready(tp["layers"]["input_layernorm"])
log(f"init {time.time()-t0:.1f}s; kernel supported (B=2): "
    f"{step_supported(tp, cfg, batch=2)}")

B, T, H = 2, 512, cfg.hidden_size
greedy = gen.SamplingConfig(
    temperature=0.0, top_k=0, top_p=1.0, repetition_penalty=1.0,
    forbid_eos=True,
)
pe = (jax.random.normal(jax.random.PRNGKey(3), (B, 64, H), jnp.float32) * 0.1
      ).astype(jnp.bfloat16)
pl = jnp.asarray([50, 41], jnp.int32)
te = jnp.zeros((B, 8, H), jnp.bfloat16)
tl = jnp.asarray([4, 4], jnp.int32)
kw = dict(
    talker_cfg=cfg, cp_cfg=cpc, sampling=greedy,
    prefill_embeds=pe, prefill_lens=pl, trailing_embeds=te, trailing_lens=tl,
    tts_pad_embed=jnp.zeros((H,), jnp.bfloat16),
    max_steps=jnp.full((B,), 6, jnp.int32), max_frames=8,
)

t0 = time.time()
ref = bg.generate_codes_batch(
    tp, cpp, cache=tk.make_cache(cfg, B, T, jnp.bfloat16),
    key=jax.random.fold_in(jax.random.PRNGKey(9), 0), **kw,
)
jax.block_until_ready(ref.codes)
log(f"direct single-chip run compile+exec {time.time()-t0:.1f}s; "
    f"frames={np.asarray(ref.n_frames).tolist()}")

mesh = pm.make_mesh(jax.devices()[:1], tp=1)  # dp=1: same chip, shard_map'd
t0 = time.time()
got = generate_codes_batch_dp(
    tp, cpp, mesh=mesh, cache=tk.make_cache(cfg, B, T, jnp.bfloat16),
    key=jax.random.PRNGKey(9), **kw,
)
jax.block_until_ready(got.codes)
log(f"dp=1 shard_map run compile+exec {time.time()-t0:.1f}s; "
    f"frames={np.asarray(got.n_frames).tolist()}")

ok_codes = bool((np.asarray(got.codes) == np.asarray(ref.codes)).all())
ok_frames = bool((np.asarray(got.n_frames) == np.asarray(ref.n_frames)).all())
log(f"greedy codes bit-match: {ok_codes}; frames match: {ok_frames}")
if not (ok_codes and ok_frames):
    sys.exit(1)
log("VALIDATE-DP OK: megakernels execute inside shard_map on hardware")
