"""int4/int8 affine group quantization: packed weights + dequant-in-matmul.

Capability parity with the reference's MLX quantized checkpoints
(reference: Qwen3.swift:1412-1428; format spec docs/paper.tex:225-256):
weights are packed little-endian into uint32 with per-group (default 64)
scales and biases along the input dimension:

    w[o, i] = scales[o, i//g] * q[o, i] + biases[o, i//g]

Two execution paths:
  * ``quant_matmul``       — XLA path: unpack + dequant + matmul, fused by
                             XLA; works on every backend (tests run on CPU).
  * ``quant_matmul_pallas``— TPU Pallas kernel that streams the PACKED
                             weight through VMEM and dequantizes in-kernel,
                             cutting HBM traffic 4x vs bf16 (the decode loop
                             is weight-bandwidth-bound, SURVEY.md §6).

Packing helpers mirror the MLX layout exactly so checkpoints and synthetic
tests share one format.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pack_quantized(w: np.ndarray, bits: int = 4, group: int = 64):
    """Quantize float [O, I] to MLX affine layout.

    Returns (packed uint32 [O, I*bits/32], scales [O, I/group],
    biases [O, I/group]).
    """
    O, I = w.shape
    assert I % group == 0
    per_word = 32 // bits
    levels = (1 << bits) - 1
    grouped = w.reshape(O, I // group, group).astype(np.float32)
    w_min = grouped.min(axis=-1)
    w_max = grouped.max(axis=-1)
    scales = ((w_max - w_min) / levels).astype(np.float32)
    scales = np.where(scales == 0, 1e-8, scales)
    biases = w_min.astype(np.float32)
    q = np.clip(
        np.round((grouped - biases[..., None]) / scales[..., None]), 0, levels
    ).astype(np.uint32)
    q = q.reshape(O, I)
    packed = np.zeros((O, I // per_word), np.uint32)
    for j in range(per_word):
        packed |= q[:, j::per_word] << (bits * j)
    return packed, scales, biases


def unpack_quantized(packed: jnp.ndarray, bits: int) -> jnp.ndarray:
    """uint32 [..., I/per_word] -> float32 levels [..., I]."""
    per_word = 32 // bits
    mask = (1 << bits) - 1
    shifts = jnp.arange(per_word, dtype=jnp.uint32) * bits
    q = (packed[..., None] >> shifts) & mask  # [..., I/pw, pw]
    return q.reshape(*packed.shape[:-1], packed.shape[-1] * per_word).astype(jnp.float32)


def dequantize(packed, scales, biases, bits: int = 4, group: int = 64) -> jnp.ndarray:
    """Full dequantization to float32 [O, I] (load-time / fallback path)."""
    q = unpack_quantized(packed, bits)
    I = q.shape[-1]
    s = jnp.repeat(scales, group, axis=-1)[..., :I]
    b = jnp.repeat(biases, group, axis=-1)[..., :I]
    return q * s + b


def quant_matmul(x: jnp.ndarray, packed, scales, biases, bits: int = 4, group: int = 64):
    """XLA path: y = x @ dequant(w).T for x [..., I], packed [O, I/pw].

    Returns [..., O] in x.dtype (f32 accumulation).
    """
    w = dequantize(packed, scales, biases, bits, group)  # [O, I] f32
    y = jax.lax.dot_general(
        x.astype(jnp.float32), w, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _quant_matmul_kernel(bits: int, group: int, x_ref, w_ref, s_ref, b_ref, o_ref):
    """One output tile: y[1, O_t] = x [1, I] . dequant(w [O_t, I/pw]).

    Strategy (B=1 decode): per packed word k holding inputs pw*k..pw*k+pw-1,
      t[o, k]  = sum_j q_j[o, k] * x_j[k]          (VPU, packed lane layout)
      T[o, g]  = sum_{k in group g} t[o, k]        (MXU: t @ group-indicator)
      y[o]     = sum_g s[o, g] * T[o, g] + b[o, g] * XS[g]
    No [O, I] dequantized matrix is ever materialized, and the group
    reduction avoids lane-dim reshapes (unsupported by Mosaic) by using a
    tiny 0/1 indicator matmul.
    """
    from jax.experimental.pallas import tpu as pltpu

    per_word = 32 // bits
    mask = (1 << bits) - 1
    # Mosaic can't cast uint32 -> f32 directly; bitcast to int32 first
    # (nibble values are < 2**bits, so the reinterpret is value-preserving)
    w = pltpu.bitcast(w_ref[...], jnp.int32)  # [O_t, W]
    x = x_ref[...]  # [per_word, W] f32 (pre-strided outside)
    acc = jnp.zeros(w.shape, jnp.float32)
    for j in range(per_word):
        qj = ((w >> (bits * j)) & mask).astype(jnp.float32)
        acc = acc + qj * x[j][None]

    words_per_group = group // per_word
    O_t, W = acc.shape
    ng = W // words_per_group
    ng_pad = max(128, ((ng + 127) // 128) * 128)
    # indicator[k, g] = 1 if word k belongs to group g
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (W, ng_pad), 0) // words_per_group
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (W, ng_pad), 1)
    indicator = (k_ids == g_ids).astype(jnp.float32)

    T = jnp.dot(acc, indicator, preferred_element_type=jnp.float32)  # [O_t, ng_pad]
    xs = jnp.dot(x.sum(axis=0, keepdims=True), indicator,
                 preferred_element_type=jnp.float32)  # [1, ng_pad]
    y = (T[:, :ng] * s_ref[...]).sum(-1) + (b_ref[...] * xs[:, :ng]).sum(-1)
    o_ref[...] = y[None]


@functools.partial(jax.jit, static_argnames=("bits", "group", "block_o"))
def quant_matmul_pallas(
    x: jnp.ndarray,  # [1, I]
    packed: jnp.ndarray,  # [O, I/pw] uint32
    scales: jnp.ndarray,  # [O, I/group]
    biases: jnp.ndarray,  # [O, I/group]
    bits: int = 4,
    group: int = 64,
    block_o: int = 256,
):
    """Dequant-in-matmul for single-token decode. Returns [1, O] float32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    per_word = 32 // bits
    O, W = packed.shape
    I = W * per_word
    assert x.shape == (1, I)
    block_o = min(block_o, O)
    # pre-stride x into [per_word, I/pw]: x_strided[j, k] = x[k*pw + j]
    x_strided = x.reshape(W, per_word).T.astype(jnp.float32)

    kernel = functools.partial(_quant_matmul_kernel, bits, group)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, O), jnp.float32),
        grid=(O // block_o,),
        in_specs=[
            pl.BlockSpec((per_word, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, scales.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, biases.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_o), lambda i: (0, i), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * O * I, bytes_accessed=packed.size * 4 + O * 4, transcendentals=0
        ),
    )(x_strided, packed, scales, biases)
    return y


@jax.tree_util.register_pytree_node_class
class PackedLinear:
    """Packed quantized weight as a pytree node (bits/group are static aux).

    q: uint32 [..., O, I/per_word], scales/biases: [..., O, I/group].
    Works inside scan/jit: leading-axis stacking and indexing slice the
    leaves while bits/group stay compile-time constants.
    """

    def __init__(self, q, scales, biases, bits: int = 4, group: int = 64):
        self.q = q
        self.scales = scales
        self.biases = biases
        self.bits = bits
        self.group = group

    def tree_flatten(self):
        return (self.q, self.scales, self.biases), (self.bits, self.group)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux[0], aux[1])

    def __getitem__(self, idx):
        return PackedLinear(
            self.q[idx], self.scales[idx], self.biases[idx], self.bits, self.group
        )

    @property
    def in_features(self) -> int:
        return self.q.shape[-1] * (32 // self.bits)

    @property
    def out_features(self) -> int:
        return self.q.shape[-2]


@jax.tree_util.register_pytree_node_class
class Int8Linear:
    """Weight-only int8 linear for the decode hot path (runtime-quantized).

    q: int8 [..., in, out], scale: float32 [..., 1, out] (per-output-channel
    symmetric). y = (x @ q.astype(x.dtype)) * scale — XLA fuses the
    int8->bf16 convert into the matmul's operand load, so HBM weight traffic
    halves while the MXU still runs bf16. Measured on v5e (0.6B decode
    matmul stack, B=1): 1.055 ms vs 1.500 ms bf16 = 1.42x; the int8x int8
    MXU path measured slower (1.17 ms), so weight-only is the production
    format. Unlike PackedLinear (the MLX checkpoint format, per-group
    affine), this is OUR serving-side format: any checkpoint can opt in at
    load with from_pretrained(..., quantize='int8').
    """

    def __init__(self, q, scale):
        self.q = q
        self.scale = scale

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    def __getitem__(self, idx):
        return Int8Linear(self.q[idx], self.scale[idx])

    @property
    def shape(self):  # duck-type the dense [., in, out] stack shape
        return self.q.shape


def quantize_int8(w) -> Int8Linear:
    """Per-output-channel symmetric int8 quantization of [..., in, out]."""
    w32 = jnp.asarray(w).astype(jnp.float32)
    a = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.where(a == 0, jnp.float32(1.0), a / 127.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return Int8Linear(q, scale.astype(jnp.float32))


def int8_matmul(x: jnp.ndarray, w: Int8Linear) -> jnp.ndarray:
    """y = x @ dequant(w) with the convert fused into the dot. [..., out]."""
    y = jax.lax.dot_general(
        x, w.q.astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y * w.scale).astype(x.dtype)


# layer-stack keys eligible for weight-only int8 (matmuls only — norms and
# embedding gathers stay in the activation dtype)
_INT8_LAYER_KEYS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj", "qkv_proj", "gate_up_proj",
)


@functools.partial(jax.jit)
def _quantize_tree(tree):
    return jax.tree_util.tree_map(quantize_int8, tree)


def quantize_decode_params_int8(params: dict, head_key: str | None) -> dict:
    """Runtime int8 quantization of a talker/code-predictor param dict.

    Quantizes the stacked per-layer matmul weights plus the output head
    (codec_head / lm_head). Raises if weights are already PackedLinear —
    load with keep_packed=False first (from_pretrained does this
    automatically when quantize='int8' is requested).
    """
    layers = dict(params["layers"])
    todo = {k: layers[k] for k in _INT8_LAYER_KEYS if k in layers}
    if head_key and head_key in params:
        todo[head_key] = params[head_key]
    for v in todo.values():
        if isinstance(v, (PackedLinear, Int8Linear)):
            raise ValueError(
                "runtime int8 quantization needs dense weights; load the "
                "checkpoint with keep_packed=False"
            )
    quant = _quantize_tree(todo)
    out = dict(params)
    for k in list(todo):
        if k == head_key:
            out[head_key] = quant[k]
        else:
            layers[k] = quant[k]
    out["layers"] = layers
    return out


def embed_lookup(table: PackedLinear, ids: jnp.ndarray) -> jnp.ndarray:
    """Row lookup in a packed quantized embedding table.

    table leaves: q [V, D/pw], scales/biases [V, D/group]; ids [...] int32
    -> float32 [..., D]. Only the gathered rows are dequantized.
    """
    q_rows = table.q[ids]
    s_rows = table.scales[ids]
    b_rows = table.biases[ids]
    return dequantize(q_rows, s_rows, b_rows, table.bits, table.group)
