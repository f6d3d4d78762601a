"""Fast host-side (numpy) parameter initialization + int4 packing.

``jax.random``-based init is convenient for tests but issues hundreds of
small device ops — on a tunneled TPU backend that costs minutes. These
builders produce the exact same pytree structures from numpy in seconds;
arrays transfer to the device lazily on first use. Used by bench.py and the
driver entry points; synthetic-weights only (real checkpoints load through
utils/loader.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config import CodePredictorConfig, TalkerConfig
from ..ops.quant import PackedLinear, pack_quantized


def _rs(seed: int, tag: str) -> np.random.Generator:
    # zlib.crc32, NOT hash(): Python string hashing is salted per process
    # (PYTHONHASHSEED), which made synthetic weights differ between runs —
    # cross-process comparisons (bench reruns, validation tools) need the
    # same weights for the same (seed, tag)
    import zlib

    return np.random.default_rng(zlib.crc32(f"{seed}:{tag}".encode()))


def _mat(seed, tag, *shape, scale=None, dtype=None):
    scale = scale if scale is not None else 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
    return _rs(seed, tag).standard_normal(shape, dtype=np.float32) * np.float32(scale)


def _layer_stack(seed, tag, L, d_in, d_out, dtype=None):
    scale = np.float32(1.0 / np.sqrt(d_in))
    return _rs(seed, tag).standard_normal((L, d_in, d_out), dtype=np.float32) * scale


def to_device(params, dtype=jnp.bfloat16):
    """Transfer a host-numpy param tree, casting float arrays to ``dtype``.

    PackedLinear leaves keep their integer/f32 payloads unchanged."""
    import jax

    import ml_dtypes

    np_dtype = np.dtype(ml_dtypes.bfloat16) if dtype == jnp.bfloat16 else np.dtype(dtype)

    def conv(x):
        if isinstance(x, np.ndarray) and np.issubdtype(x.dtype, np.floating):
            # cast host-side first: halves the bytes shipped to the device
            return jnp.asarray(x.astype(np_dtype))
        return jnp.asarray(x)

    return jax.tree.map(conv, params)


def host_init_talker_params(seed: int, cfg: TalkerConfig, dtype=None):
    """Numpy f32 param tree (transfer with :func:`to_device`)."""
    L, h, hd = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    inter = max(cfg.layer_intermediate_size(i) for i in range(L))
    layers = {
        "q_proj": _layer_stack(seed, "q", L, h, nq * hd, dtype),
        "k_proj": _layer_stack(seed, "k", L, h, nkv * hd, dtype),
        "v_proj": _layer_stack(seed, "v", L, h, nkv * hd, dtype),
        "o_proj": _layer_stack(seed, "o", L, nq * hd, h, dtype),
        "q_norm": np.ones((L, hd), np.float32),
        "k_norm": np.ones((L, hd), np.float32),
        "gate_proj": _layer_stack(seed, "g", L, h, inter, dtype),
        "up_proj": _layer_stack(seed, "u", L, h, inter, dtype),
        "down_proj": _layer_stack(seed, "d", L, inter, h, dtype),
        "input_layernorm": np.ones((L, h), np.float32),
        "post_attention_layernorm": np.ones((L, h), np.float32),
    }
    return {
        "codec_embedding": _mat(seed, "ce", cfg.vocab_size, h, scale=0.02, dtype=None),
        "text_embedding": _mat(
            seed, "te", cfg.text_vocab_size, cfg.text_hidden_size, scale=0.02, dtype=None
        ),
        "layers": layers,
        "norm": np.ones((h,), np.float32),
        "text_projection": {
            "fc1": {
                "w": _mat(seed, "fc1", cfg.text_hidden_size, cfg.text_hidden_size, dtype=None),
                "b": np.zeros((cfg.text_hidden_size,), np.float32),
            },
            "fc2": {
                "w": _mat(seed, "fc2", cfg.text_hidden_size, h, dtype=None),
                "b": np.zeros((h,), np.float32),
            },
        },
        "codec_head": _mat(seed, "head", h, cfg.vocab_size, dtype=None),
    }


def host_init_cp_params(
    seed: int, cfg: CodePredictorConfig, talker_hidden_size: int, dtype=None
):
    """Numpy f32 param tree (transfer with :func:`to_device`)."""
    L, h, hd = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    n = cfg.num_code_groups - 1
    layers = {
        "q_proj": _layer_stack(seed, "cq", L, h, nq * hd, dtype),
        "k_proj": _layer_stack(seed, "ck", L, h, nkv * hd, dtype),
        "v_proj": _layer_stack(seed, "cv", L, h, nkv * hd, dtype),
        "o_proj": _layer_stack(seed, "co", L, nq * hd, h, dtype),
        "q_norm": np.ones((L, hd), np.float32),
        "k_norm": np.ones((L, hd), np.float32),
        "gate_proj": _layer_stack(seed, "cg", L, h, cfg.intermediate_size, dtype),
        "up_proj": _layer_stack(seed, "cu", L, h, cfg.intermediate_size, dtype),
        "down_proj": _layer_stack(seed, "cd", L, cfg.intermediate_size, h, dtype),
        "input_layernorm": np.ones((L, h), np.float32),
        "post_attention_layernorm": np.ones((L, h), np.float32),
    }
    params = {
        "codec_embedding": _layer_stack(seed, "cce", n, cfg.vocab_size, talker_hidden_size, dtype) * 1,
        "layers": layers,
        "norm": np.ones((h,), np.float32),
        "lm_head": _layer_stack(seed, "clm", n, h, cfg.vocab_size, dtype),
    }
    if cfg.hidden_size != talker_hidden_size:
        params["small_to_mtp_projection"] = {
            "w": _mat(seed, "mtp", talker_hidden_size, cfg.hidden_size, dtype=None),
            "b": np.zeros((cfg.hidden_size,), np.float32),
        }
    return params


def device_init_talker_params(seed: int, cfg: TalkerConfig, dtype=jnp.bfloat16):
    """Synthetic talker params initialized ON DEVICE in one jit program.

    Same pytree structure and weight distribution as
    :func:`host_init_talker_params`, but values are generated by the TPU's
    PRNG instead of host numpy + tunnel transfer — for the 0.6B that cuts
    bench param setup from ~122 s (host init + ~1.2 GB over the tunneled
    backend) to a few seconds. Values differ from the host builders (a
    different RNG), which is fine everywhere synthetic weights are used for
    timing; cross-process value reproducibility stays with host_init.
    """
    import jax

    L, h, hd = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    inter = max(cfg.layer_intermediate_size(i) for i in range(L))
    th = cfg.text_hidden_size

    @jax.jit
    def build(key):
        ks = iter(jax.random.split(key, 16))

        def mat(*shape, scale=None):
            s = np.float32(
                scale if scale is not None
                else 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            )
            return (jax.random.normal(next(ks), shape, jnp.float32) * s).astype(dtype)

        ones = lambda *shape: jnp.ones(shape, dtype)
        layers = {
            "q_proj": mat(L, h, nq * hd),
            "k_proj": mat(L, h, nkv * hd),
            "v_proj": mat(L, h, nkv * hd),
            "o_proj": mat(L, nq * hd, h),
            "q_norm": ones(L, hd),
            "k_norm": ones(L, hd),
            "gate_proj": mat(L, h, inter),
            "up_proj": mat(L, h, inter),
            "down_proj": mat(L, inter, h),
            "input_layernorm": ones(L, h),
            "post_attention_layernorm": ones(L, h),
        }
        return {
            "codec_embedding": mat(cfg.vocab_size, h, scale=0.02),
            "text_embedding": mat(cfg.text_vocab_size, th, scale=0.02),
            "layers": layers,
            "norm": ones(h),
            "text_projection": {
                "fc1": {"w": mat(th, th), "b": jnp.zeros((th,), dtype)},
                "fc2": {"w": mat(th, h), "b": jnp.zeros((h,), dtype)},
            },
            "codec_head": mat(h, cfg.vocab_size),
        }

    return build(jax.random.PRNGKey(seed))


def device_init_cp_params(
    seed: int, cfg: CodePredictorConfig, talker_hidden_size: int, dtype=jnp.bfloat16
):
    """Device-side synthetic code-predictor params (see
    :func:`device_init_talker_params`)."""
    import jax

    L, h, hd = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    n = cfg.num_code_groups - 1

    @jax.jit
    def build(key):
        ks = iter(jax.random.split(key, 16))

        def mat(*shape, scale=None):
            s = np.float32(
                scale if scale is not None
                else 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            )
            return (jax.random.normal(next(ks), shape, jnp.float32) * s).astype(dtype)

        ones = lambda *shape: jnp.ones(shape, dtype)
        layers = {
            "q_proj": mat(L, h, nq * hd),
            "k_proj": mat(L, h, nkv * hd),
            "v_proj": mat(L, h, nkv * hd),
            "o_proj": mat(L, nq * hd, h),
            "q_norm": ones(L, hd),
            "k_norm": ones(L, hd),
            "gate_proj": mat(L, h, cfg.intermediate_size),
            "up_proj": mat(L, h, cfg.intermediate_size),
            "down_proj": mat(L, cfg.intermediate_size, h),
            "input_layernorm": ones(L, h),
            "post_attention_layernorm": ones(L, h),
        }
        params = {
            "codec_embedding": mat(
                n, cfg.vocab_size, talker_hidden_size,
                scale=1.0 / np.sqrt(cfg.vocab_size),
            ),
            "layers": layers,
            "norm": ones(h),
            "lm_head": mat(n, h, cfg.vocab_size),
        }
        if cfg.hidden_size != talker_hidden_size:
            params["small_to_mtp_projection"] = {
                "w": mat(talker_hidden_size, cfg.hidden_size),
                "b": jnp.zeros((cfg.hidden_size,), dtype),
            }
        return params

    return build(jax.random.PRNGKey(seed))


def int4_roundtrip_values(w: jnp.ndarray, bits: int = 4, group: int = 64):
    """Quantize-dequantize ``w`` [..., in, out] through MLX-style per-group
    affine int4 ON DEVICE — the float values a packed int4 checkpoint
    yields after unpacking (pack_quantized/dequantize math, ops/quant.py),
    without a host round-trip. Groups run along the INPUT dim of each
    output row, matching pack_quantized(w.T)."""
    orig_dtype = w.dtype
    wt = jnp.swapaxes(w.astype(jnp.float32), -1, -2)  # [..., out, in]
    g = wt.reshape(*wt.shape[:-1], wt.shape[-1] // group, group)
    wmax = g.max(axis=-1, keepdims=True)
    wmin = g.min(axis=-1, keepdims=True)
    scale = (wmax - wmin) / (2**bits - 1)
    scale = jnp.where(scale == 0, jnp.float32(1.0), scale)
    q = jnp.clip(jnp.round((g - wmin) / scale), 0, 2**bits - 1)
    deq = (q * scale + wmin).reshape(wt.shape)
    return jnp.swapaxes(deq, -1, -2).astype(orig_dtype)


def pack_linear_params(params: dict, names=None, bits: int = 4, group: int = 64) -> dict:
    """Replace the stacked per-layer linear weights (host numpy arrays,
    [L, in, out]) with stacked PackedLinears; also packs codec_head/lm_head.

    Only meaningful for host-initialized params (before device transfer).
    """
    out = dict(params)
    layer_names = names or (
        "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"
    )

    def pack_stacked(w):
        w = np.asarray(w, np.float32)
        qs, ss, bs = [], [], []
        for i in range(w.shape[0]):
            q, s, b = pack_quantized(w[i].T, bits=bits, group=group)
            qs.append(q)
            ss.append(s)
            bs.append(b)
        return PackedLinear(
            jnp.asarray(np.stack(qs)), jnp.asarray(np.stack(ss)),
            jnp.asarray(np.stack(bs)), bits, group,
        )

    layers = dict(out["layers"])
    for name in layer_names:
        layers[name] = pack_stacked(layers[name])
    out["layers"] = layers
    if "codec_head" in out:
        q, s, b = pack_quantized(np.asarray(out["codec_head"], np.float32).T, bits, group)
        out["codec_head"] = PackedLinear(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(b), bits, group
        )
    if "lm_head" in out:
        out["lm_head"] = pack_stacked(out["lm_head"])
    return out
