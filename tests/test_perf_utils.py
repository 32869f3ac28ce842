"""Perf/observability utilities (genima_tpu.perf)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genima_tpu import perf

pytestmark = pytest.mark.fast


def test_chain_time_measures_per_iteration():
    w = jnp.eye(64) * 0.999

    def step(c):
        return c @ w

    dt = perf.chain_time(step, jnp.ones((64, 64)), length=10, calls=2)
    assert 0 < dt < 1.0


def test_call_time_stats():
    f = jax.jit(lambda x: x * 2 + 1)
    stats = perf.call_time(f, jnp.ones((8, 8)), calls=5, warmup=1)
    assert stats["min"] <= stats["p50"] <= stats["max"]


def test_ablate_attention_changes_output_and_restores():
    from genima_tpu.nn.layers import Attention

    x = jax.random.normal(jax.random.key(0), (1, 64, 32))
    attn = Attention(query_dim=32, heads=2)
    params = attn.init(jax.random.key(1), x)["params"]
    base = attn.apply({"params": params}, x)
    with perf.ablate_attention():
        knocked = attn.apply({"params": params}, x)
    restored = attn.apply({"params": params}, x)
    assert not np.allclose(np.asarray(base), np.asarray(knocked))
    np.testing.assert_allclose(np.asarray(base), np.asarray(restored))


def test_ablate_group_norm_changes_output_and_restores():
    from genima_tpu.nn.layers import ResnetBlock2D

    x = jax.random.normal(jax.random.key(2), (1, 8, 8, 32))
    block = ResnetBlock2D(32, use_time_emb=False)
    params = block.init(jax.random.key(3), x)["params"]
    base = block.apply({"params": params}, x)
    with perf.ablate_group_norm():
        block2 = ResnetBlock2D(32, use_time_emb=False)
        p2 = block2.init(jax.random.key(3), x)["params"]
        knocked = block2.apply({"params": p2}, x)
    assert not np.allclose(np.asarray(base), np.asarray(knocked))
    restored = block.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(base), np.asarray(restored))


def test_hbm_bytes():
    tree = {"a": jnp.zeros((4, 4), jnp.float32), "b": jnp.zeros(8, jnp.int8)}
    assert perf.hbm_bytes(tree) == 4 * 4 * 4 + 8
