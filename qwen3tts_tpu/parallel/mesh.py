"""Device-mesh parallelism: tensor-parallel (+ data-parallel) sharding.

The reference is strictly single-device (SURVEY.md §2.4) — this module is
the idiomatic TPU extension for serving the 1.7B talker across ICI: a
("dp", "tp") `jax.sharding.Mesh`, NamedSharding annotations on the weight
pytrees and KV caches, and XLA-inserted collectives (no hand-written
NCCL-style code, per the pjit programming model).

Sharding layout (Megatron-style column/row parallel):
  q/k/v projections  [L, h, heads*hd]   -> shard heads over "tp"
  o projection       [L, heads*hd, h]   -> shard the contracting dim ("tp")
  gate/up            [L, h, inter]      -> shard inter over "tp"
  down               [L, inter, h]      -> shard the contracting dim ("tp")
  KV cache           [L, B, Hkv, T, D]  -> batch over "dp", Hkv over "tp"
  embeddings / norms / heads            -> replicated
Attention heads stay local to a shard, so the only per-layer collectives are
the two psums after o_proj and down_proj, riding ICI.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, tp: int | None = None) -> Mesh:
    """Build a ("dp", "tp") mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = n
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def _named(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def talker_param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching models/talker.py param structure."""
    if "qkv_proj" in params.get("layers", {}):
        raise ValueError(
            "TP sharding requires unfused projections: load with fuse=False "
            "(fused qkv concat would split q/k/v head groups across shards)"
        )
    layer_specs = {
        "q_proj": P(None, None, "tp"),
        "k_proj": P(None, None, "tp"),
        "v_proj": P(None, None, "tp"),
        "o_proj": P(None, "tp", None),
        "q_norm": P(),
        "k_norm": P(),
        "gate_proj": P(None, None, "tp"),
        "up_proj": P(None, None, "tp"),
        "down_proj": P(None, "tp", None),
        "input_layernorm": P(),
        "post_attention_layernorm": P(),
    }
    specs = {
        "codec_embedding": P(),
        "text_embedding": P(),
        "layers": layer_specs,
        "norm": P(),
        "text_projection": {"fc1": {"w": P(), "b": P()}, "fc2": {"w": P(), "b": P()}},
        "codec_head": P(),
    }
    if "text_token_map" in params:
        specs["text_token_map"] = P()
    return specs


def cp_param_specs(params: Any) -> Any:
    specs = {
        "codec_embedding": P(),
        "layers": {
            "q_proj": P(None, None, "tp"),
            "k_proj": P(None, None, "tp"),
            "v_proj": P(None, None, "tp"),
            "o_proj": P(None, "tp", None),
            "q_norm": P(),
            "k_norm": P(),
            "gate_proj": P(None, None, "tp"),
            "up_proj": P(None, None, "tp"),
            "down_proj": P(None, "tp", None),
            "input_layernorm": P(),
            "post_attention_layernorm": P(),
        },
        "norm": P(),
        "lm_head": P(),
    }
    if "small_to_mtp_projection" in params:
        specs["small_to_mtp_projection"] = {"w": P(), "b": P()}
    return specs


def cache_spec(batch_sharded: bool = True, heads_sharded: bool = True) -> P:
    """KV cache [L, B, Hkv, T, D]: batch over dp (if divisible), kv heads
    over tp (if divisible)."""
    return P(
        None,
        "dp" if batch_sharded else None,
        "tp" if heads_sharded else None,
        None,
        None,
    )


def _shard_leaf(x, s: P, mesh: Mesh):
    from ..ops.quant import Int8Linear, PackedLinear

    if isinstance(x, PackedLinear):
        raise ValueError(
            "TP sharding of MLX-packed int4 weights is not supported (the "
            "packed [O, I/8] layout does not match the dense specs); load "
            "with keep_packed=False or quantize='int8'"
        )
    if isinstance(x, Int8Linear):
        # q follows the dense spec; scale is [..., 1, out] so any axis of
        # size 1 (the contracted dim) cannot be sharded — drop it to None
        sc_spec = P(*[
            ax if i < len(x.scale.shape) and x.scale.shape[i] != 1 else None
            for i, ax in enumerate(s)
        ])
        from ..ops.quant import Int8Linear as _I8

        return _I8(
            jax.device_put(x.q, _named(mesh, s)),
            jax.device_put(x.scale, _named(mesh, sc_spec)),
        )
    return jax.device_put(x, _named(mesh, s))


def shard_params(params: Any, specs: Any, mesh: Mesh) -> Any:
    """device_put every leaf with its NamedSharding (XLA handles the rest)."""
    from ..ops.quant import Int8Linear, PackedLinear

    return jax.tree.map(
        lambda x, s: _shard_leaf(x, s, mesh),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, (P, Int8Linear, PackedLinear)),
    )


def shard_talker(params: Any, mesh: Mesh) -> Any:
    return shard_params(params, talker_param_specs(params), mesh)


def shard_cp(params: Any, mesh: Mesh) -> Any:
    return shard_params(params, cp_param_specs(params), mesh)


def shard_cache(cache, mesh: Mesh):
    batch, hkv = cache.k.shape[1], cache.k.shape[2]
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    spec = cache_spec(
        batch_sharded=batch % dp == 0 and dp > 1,
        heads_sharded=hkv % tp == 0,
    )
    s5 = _named(mesh, spec)
    s4 = _named(mesh, P(*tuple(spec)[:4]))  # scale leaves: [L, B, Hkv, T]
    return type(cache)(
        *(jax.device_put(a, s5 if a.ndim == 5 else s4) for a in cache)
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    s = _named(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
