"""Data-parallel scale-out of the fused batch-decode fast path.

``parallel/mesh.py`` covers tensor parallelism: Megatron shardings on the
weight pytrees, XLA collectives, and the (unfused-layout) XLA decode path.
This module covers the other production axis — serving THROUGHPUT — the
way a TPU pod actually deploys a model that fits one chip: replicate the
single-chip configuration (fused projections, int8 weights, Pallas
megakernels) across devices and shard *requests*, not layers.

The whole lockstep decode (models/batch_generate.py) is wrapped in one
``jax.shard_map`` over the mesh's "dp" axis:

  - weights replicated (``P()``) — each device streams its own copy from
    its own HBM, exactly like N independent chips;
  - every per-sequence buffer (prefill/trailing embeds, lengths, caps, the
    KV cache batch dim) sharded ``P("dp")``;
  - inside the shard, each device sees a local batch of B/dp and runs the
    UNMODIFIED single-chip program — including the fused talker-step and
    code-predictor Pallas kernels when their layout gates pass
    (ops/talker_kernel.py:step_supported). shard_map hands Pallas
    per-device shapes, so the kernels never see the mesh at all.

Decode is embarrassingly parallel over sequences — there is no cross-chip
communication in the steady state (the one collective-free design the
scaling playbook prescribes for replicated serving), so throughput scales
with the dp size at constant step latency, and per-shard early exit
(`lax.while_loop`) lets a shard whose sequences all finished idle instead
of stepping to the global maximum.

No reference counterpart (the reference is single-device, batch-1 —
SURVEY.md §2.4); this is the TPU-native scale-out story. Validated on the
8-virtual-device CPU mesh (tests/test_parallel.py::TestDpShardMap) for
both the sharded-XLA decode numerics and Pallas-kernel-under-shard_map
composition (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import batch_generate as bg


def dp_size(mesh: Mesh) -> int:
    """Usable data-parallel width of a ("dp", "tp") mesh (tp must be 1:
    the fast path replicates whole-model weights per device)."""
    if mesh.shape.get("tp", 1) != 1:
        raise ValueError(
            "generate_codes_batch_dp replicates full weights per device; "
            f"use a tp=1 mesh (got tp={mesh.shape['tp']}). For models too "
            "big for one chip, use the TP path (parallel/mesh.py)."
        )
    return mesh.shape["dp"]


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "talker_cfg", "cp_cfg", "sampling", "max_frames"),
)
def generate_codes_batch_dp(
    talker_params,
    cp_params,
    *,
    mesh: Mesh,
    talker_cfg,
    cp_cfg,
    sampling,
    prefill_embeds: jnp.ndarray,  # [B, P_bucket, h] right-padded
    prefill_lens: jnp.ndarray,  # [B]
    trailing_embeds: jnp.ndarray,  # [B, T_trail, h]
    trailing_lens: jnp.ndarray,  # [B]
    tts_pad_embed: jnp.ndarray,  # [h]
    cache,  # KVCache/KVCacheQ, leaves [L, B, ...]
    max_steps: jnp.ndarray,  # [B]
    max_frames: int,
    key: jax.Array,
) -> bg.BatchResult:
    """Lockstep batch synthesis sharded over the mesh's "dp" axis.

    Semantics match ``models/batch_generate.py::generate_codes_batch`` run
    per shard: shard s of size B/dp decodes with ``fold_in(key, s)`` (each
    shard needs an independent sampling stream — in-kernel PRNG rows are
    seeded by LOCAL row index, which restarts per shard). B must divide by
    the dp size; callers validate (tts.py raises a typed error).
    """
    dp = dp_size(mesh)
    B = prefill_embeds.shape[0]
    assert B % dp == 0, f"batch {B} not divisible by dp={dp}"

    def shard_fn(tkp, cpp, pe, pl, te, tl, pad, cache_, ms, key_):
        key_ = jax.random.fold_in(key_, jax.lax.axis_index("dp"))
        carry = bg.prefill_start_batch.__wrapped__(
            tkp, cpp, talker_cfg=talker_cfg, cp_cfg=cp_cfg, sampling=sampling,
            prefill_embeds=pe, prefill_lens=pl, trailing_embeds=te,
            trailing_lens=tl, tts_pad_embed=pad, cache=cache_,
            max_frames=max_frames, key=key_,
        )
        carry = bg.generate_chunk_batch.__wrapped__(
            tkp, cpp, carry, talker_cfg=talker_cfg, cp_cfg=cp_cfg,
            sampling=sampling, trailing_embeds=te, trailing_lens=tl,
            tts_pad_embed=pad, max_steps=ms, until_step=jnp.int32(max_frames),
        )
        return bg.BatchResult(
            codes=carry.codes, n_frames=carry.frames, tokens=carry.tokens
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(),  # talker params: replicated
            P(),  # cp params: replicated
            P("dp"),  # prefill_embeds
            P("dp"),  # prefill_lens
            P("dp"),  # trailing_embeds
            P("dp"),  # trailing_lens
            P(),  # tts_pad_embed
            P(None, "dp"),  # cache leaves [L, B, ...]
            P("dp"),  # max_steps
            P(),  # key (fold_in(axis_index) differentiates shards)
        ),
        out_specs=P("dp"),
        # loop-carried state is shard-varying by construction (per-shard
        # early exit, per-shard keys); vma checking has nothing to verify
        check_vma=False,
    )
    return fn(
        talker_params, cp_params, prefill_embeds, prefill_lens,
        trailing_embeds, trailing_lens, tts_pad_embed, cache,
        jnp.asarray(max_steps, jnp.int32), key,
    )
