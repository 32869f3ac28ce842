"""Pallas flash attention vs the XLA reference (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genima_tpu.kernels.flash_attention import flash_attention


@pytest.mark.parametrize(
    "sq,sk,h,d",
    [
        (64, 64, 2, 64),    # self-attention
        (100, 77, 3, 64),   # cross-attention with kv padding (77 -> block)
        (33, 16, 1, 64),    # ragged q padding
    ],
)
def test_matches_xla_reference(sq, sk, h, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, sq, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(2, sk, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(2, sk, h, d).astype(np.float32))
    out = flash_attention(q, k, v, block_q=32, block_k=32)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_gradients_match_reference():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 32, 2, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 24, 2, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 24, 2, 64).astype(np.float32))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, 16, 16) ** 2).sum()

    def loss_ref(q, k, v):
        return (jax.nn.dot_product_attention(q, k, v) ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_numerical_stability_large_logits():
    """Online softmax must not overflow with large score magnitudes."""
    q = jnp.full((1, 32, 1, 64), 8.0)
    k = jnp.full((1, 32, 1, 64), 8.0)
    v = jnp.ones((1, 32, 1, 64))
    out = flash_attention(q, k, v, 16, 16)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)
