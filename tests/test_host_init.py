"""Host-side numpy init must match the jax.random init structurally."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3tts_tpu.models import code_predictor as cp
from qwen3tts_tpu.models import talker as tk
from qwen3tts_tpu.utils import host_init as hi

from test_models import TINY_CP, TINY_TALKER


def test_same_tree_structure_and_shapes():
    ref = tk.init_talker_params(jax.random.PRNGKey(0), TINY_TALKER, jnp.float32)
    host = hi.to_device(hi.host_init_talker_params(0, TINY_TALKER), jnp.float32)
    ref_t = jax.tree.structure(ref)
    host_t = jax.tree.structure(host)
    assert ref_t == host_t
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(host)):
        assert a.shape == b.shape, (a.shape, b.shape)


def test_cp_structure_and_forward():
    ref = cp.init_code_predictor_params(
        jax.random.PRNGKey(1), TINY_CP, TINY_TALKER.hidden_size, jnp.float32
    )
    host = hi.to_device(
        hi.host_init_cp_params(1, TINY_CP, TINY_TALKER.hidden_size), jnp.float32
    )
    assert jax.tree.structure(ref) == jax.tree.structure(host)
    x = jnp.zeros((1, 2, TINY_TALKER.hidden_size))
    cache = cp.make_cp_cache(TINY_CP, 1, jnp.float32)
    h, _ = cp.forward(host, TINY_CP, x, cache, jnp.int32(0))
    assert np.isfinite(np.asarray(h)).all()


def test_to_device_bf16_cast():
    host = hi.host_init_talker_params(0, TINY_TALKER)
    dev = hi.to_device(host, jnp.bfloat16)
    assert dev["layers"]["q_proj"].dtype == jnp.bfloat16


def test_pack_linear_params_runs_forward():
    host = hi.host_init_talker_params(2, TINY_TALKER)
    packed = hi.pack_linear_params(host, group=32)
    dev = hi.to_device(packed, jnp.float32)
    cache = tk.make_cache(TINY_TALKER, 1, 16, jnp.float32)
    x = jnp.zeros((1, 2, TINY_TALKER.hidden_size))
    h, _ = tk.forward(dev, TINY_TALKER, x, cache, jnp.int32(0))
    assert np.isfinite(np.asarray(h)).all()
