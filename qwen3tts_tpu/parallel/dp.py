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


def _carry_specs() -> bg.BatchCarry:
    """PartitionSpecs for the DISTRIBUTED BatchCarry: every per-sequence
    field shards its batch dim over "dp"; the two per-shard scalars (the
    lockstep counter and the PRNG key) carry a leading [dp] axis — shards
    advance independently (per-shard early exit, per-shard key streams),
    so they cannot be replicated scalars."""
    return bg.BatchCarry(
        step=P("dp"), steps=P("dp"), frames=P("dp"), done=P("dp"),
        cur_input=P("dp"), cache=P(None, "dp"), offsets=P("dp"),
        seen=P("dp"), codes=P("dp"), tokens=P("dp"), key=P("dp"),
    )


def _localize(c: bg.BatchCarry) -> bg.BatchCarry:
    """Distributed carry -> the per-shard BatchCarry the single-chip
    program expects (strip the [1] shard axis off step/key)."""
    return c._replace(step=c.step[0], key=c.key[0])


def _distribute(c: bg.BatchCarry) -> bg.BatchCarry:
    return c._replace(step=c.step[None], key=c.key[None])


def global_step(carry: bg.BatchCarry) -> int:
    """Host-side lockstep counter that works for both carry flavors: the
    scalar single-chip `step` and the [dp] per-shard distributed `step`
    (the max is the right chunk base — lagging shards are all-done ones)."""
    import numpy as np

    return int(np.asarray(jax.device_get(carry.step)).max())


def dp_size(mesh: Mesh) -> int:
    """Usable data-parallel width of a ("dp", "tp") mesh (tp must be 1:
    the fast path replicates whole-model weights per device)."""
    if mesh.shape.get("tp", 1) != 1:
        raise ValueError(
            "generate_codes_batch_dp replicates full weights per device; "
            f"use a tp=1 mesh (got tp={mesh.shape['tp']}). For models too "
            "big for one chip, use the TP path (parallel/mesh.py)."
        )
    if "dp" not in mesh.shape:
        raise ValueError(
            f"dp mesh needs a 'dp' axis (got axes {tuple(mesh.shape)}); "
            "build it with parallel.mesh.make_mesh(devices, tp=1)"
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
    samp_vec=None,  # [B, 4] per-slot sampling (sampling.per_request)
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

    def shard_fn(tkp, cpp, pe, pl, te, tl, pad, cache_, ms, key_, sv):
        key_ = jax.random.fold_in(key_, jax.lax.axis_index("dp"))
        carry = bg.prefill_start_batch.__wrapped__(
            tkp, cpp, talker_cfg=talker_cfg, cp_cfg=cp_cfg, sampling=sampling,
            prefill_embeds=pe, prefill_lens=pl, trailing_embeds=te,
            trailing_lens=tl, tts_pad_embed=pad, cache=cache_,
            max_frames=max_frames, key=key_, samp_vec=sv,
        )
        carry = bg.generate_chunk_batch.__wrapped__(
            tkp, cpp, carry, talker_cfg=talker_cfg, cp_cfg=cp_cfg,
            sampling=sampling, trailing_embeds=te, trailing_lens=tl,
            tts_pad_embed=pad, max_steps=ms, until_step=jnp.int32(max_frames),
            samp_vec=sv,
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
            P("dp"),  # samp_vec [B, 4] (None when not per_request)
        ),
        out_specs=P("dp"),
        # loop-carried state is shard-varying by construction (per-shard
        # early exit, per-shard keys); vma checking has nothing to verify
        check_vma=False,
    )
    return fn(
        talker_params, cp_params, prefill_embeds, prefill_lens,
        trailing_embeds, trailing_lens, tts_pad_embed, cache,
        jnp.asarray(max_steps, jnp.int32), key, samp_vec,
    )


# ---------------------------------------------------------------------------
# Continuous batching under dp: the three serving entry points
# (models/batch_generate.py: prefill_start_batch / generate_chunk_batch /
# admit_slot) shard_map'd over "dp" with a DISTRIBUTED carry — per-sequence
# state sharded, the lockstep counter and PRNG key per-shard ([dp]-leading).
# Slots keep their GLOBAL indices at the API: slot s lives on shard
# s // (B/dp); admit broadcasts the prefill to every shard (SPMD computes
# everywhere) and the owner shard alone commits the update.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "talker_cfg", "cp_cfg", "sampling", "max_frames"),
)
def prefill_start_batch_dp(
    talker_params, cp_params, *, mesh: Mesh, talker_cfg, cp_cfg, sampling,
    prefill_embeds, prefill_lens, trailing_embeds, trailing_lens,
    tts_pad_embed, cache, max_frames: int, key, samp_vec=None,
) -> bg.BatchCarry:
    """Sharded prefill + first frame; returns a DISTRIBUTED carry.
    ``samp_vec`` [B, 4] (sampling.per_request): per-slot sampling
    parameters, sharded with the slots."""
    dp = dp_size(mesh)
    assert prefill_embeds.shape[0] % dp == 0

    def shard_fn(tkp, cpp, pe, pl, te, tl, pad, cache_, key_, sv):
        key_ = jax.random.fold_in(key_, jax.lax.axis_index("dp"))
        c = bg.prefill_start_batch.__wrapped__(
            tkp, cpp, talker_cfg=talker_cfg, cp_cfg=cp_cfg, sampling=sampling,
            prefill_embeds=pe, prefill_lens=pl, trailing_embeds=te,
            trailing_lens=tl, tts_pad_embed=pad, cache=cache_,
            max_frames=max_frames, key=key_, samp_vec=sv,
        )
        return _distribute(c)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp"), P("dp"), P("dp"), P(),
                  P(None, "dp"), P(), P("dp")),
        out_specs=_carry_specs(), check_vma=False,
    )
    return fn(talker_params, cp_params, prefill_embeds, prefill_lens,
              trailing_embeds, trailing_lens, tts_pad_embed, cache, key,
              samp_vec)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "talker_cfg", "cp_cfg", "sampling"),
    donate_argnames=("carry",),
)
def generate_chunk_batch_dp(
    talker_params, cp_params, carry: bg.BatchCarry, *, mesh: Mesh,
    talker_cfg, cp_cfg, sampling, trailing_embeds, trailing_lens,
    tts_pad_embed, max_steps, until_step, samp_vec=None,
) -> bg.BatchCarry:
    """One decode chunk per shard (distributed carry in/out). ``until_step``
    bounds each shard's lockstep counter: a scalar applies globally, a [dp]
    array gives each shard its own bound. The serving loops pass the
    per-shard form (local step + chunk_frames) so a shard that idled while
    its sequences were done keeps chunk-granular harvest/admission instead
    of catching up to the busiest shard's counter in one huge chunk."""
    until = jnp.asarray(until_step, jnp.int32)
    per_shard_until = until.ndim == 1

    def shard_fn(tkp, cpp, c, te, tl, pad, ms, u, sv):
        c = bg.generate_chunk_batch.__wrapped__(
            tkp, cpp, _localize(c), talker_cfg=talker_cfg, cp_cfg=cp_cfg,
            sampling=sampling, trailing_embeds=te, trailing_lens=tl,
            tts_pad_embed=pad, max_steps=ms,
            until_step=u[0] if per_shard_until else u, samp_vec=sv,
        )
        return _distribute(c)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), _carry_specs(), P("dp"), P("dp"), P(),
                  P("dp"), P("dp") if per_shard_until else P(), P("dp")),
        out_specs=_carry_specs(), check_vma=False,
    )
    return fn(talker_params, cp_params, carry, trailing_embeds,
              trailing_lens, tts_pad_embed,
              jnp.asarray(max_steps, jnp.int32), until, samp_vec)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "talker_cfg", "cp_cfg", "sampling"),
    donate_argnames=("carry", "trailing_all"),
)
def admit_slot_dp(
    talker_params, cp_params, carry: bg.BatchCarry, trailing_all, *,
    mesh: Mesh, talker_cfg, cp_cfg, sampling, slot, prefill_embeds,
    prefill_len, trailing_row, trailing_len, tts_pad_embed, key,
    samp_row=None,
) -> tuple[bg.BatchCarry, jnp.ndarray]:
    """Admit a request into GLOBAL slot ``slot`` between decode chunks.

    Every shard runs the (single-sequence) prefill — SPMD executes the same
    program everywhere and the work is one prompt — but only the owner
    shard (slot // local_B) commits the carry/trailing update; the others
    keep their state bit-identical, including their PRNG keys (the owner
    folds the admit key by its shard index so admission never correlates
    shard streams)."""

    def shard_fn(tkp, cpp, c, tr_all, slot_, pe, pl, trow, tlen, pad, key_, sr):
        c = _localize(c)
        local_b = c.codes.shape[0]
        idx = jax.lax.axis_index("dp")
        owner = slot_ // local_b
        is_owner = idx == owner
        local_slot = jnp.where(is_owner, slot_ - owner * local_b, 0)
        new_c, new_tr = bg.admit_slot.__wrapped__(
            tkp, cpp, c, tr_all, talker_cfg=talker_cfg, cp_cfg=cp_cfg,
            sampling=sampling, slot=local_slot, prefill_embeds=pe,
            prefill_len=pl, trailing_row=trow, trailing_len=tlen,
            tts_pad_embed=pad, key=jax.random.fold_in(key_, idx),
            samp_row=sr,
        )
        c_out = jax.tree.map(lambda n, o: jnp.where(is_owner, n, o), new_c, c)
        tr_out = jnp.where(is_owner, new_tr, tr_all)
        return _distribute(c_out), tr_out

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), _carry_specs(), P("dp"), P(), P(), P(), P(),
                  P(), P(), P(), P()),
        out_specs=(_carry_specs(), P("dp")), check_vma=False,
    )
    return fn(talker_params, cp_params, carry, trailing_all,
              jnp.asarray(slot, jnp.int32), prefill_embeds,
              jnp.asarray(prefill_len, jnp.int32), trailing_row,
              jnp.asarray(trailing_len, jnp.int32), tts_pad_embed, key,
              samp_row)
