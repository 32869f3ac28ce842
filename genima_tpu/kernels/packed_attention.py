"""Packed-layout Pallas flash attention for the SD UNet/ControlNet.

Replaces the reference's xformers memory-efficient attention
(``diffusion/train_controlnet_genima.py:1112-1130``) on the exact Genima
inference shapes: batch-1 self-attention over the tiled latent grid
(4096/1024/256/64 tokens, head_dim 64, 5-20 heads).

Why a second kernel (vs ``flash_attention.py``): in-program measurement
(scripts/ablate_r2.py, v5e) showed attention costs 7.1 ms of the 20.2 ms
denoise step, and the (B*H, S, D) kernel loses ~1 ms in-pipeline because the
(S,H,D)->(H,S,D) boundary transposes defeat its standalone 2.4x. This kernel
consumes q/k/v exactly as the projection matmuls produce them — (B, S, C)
with C = heads*head_dim, no transpose, no reshape — and keeps K/V and the
per-block score matrix entirely in VMEM. XLA's unfused path materializes the
(H, S, S) f32 logits in HBM (~335 MB per 4096-token attention), which is
where the 7 ms goes; here scores never leave the chip.

Layout rules honored (Mosaic): the last block dim is the full channel axis
(any C), the second-to-last is a multiple of the sublane tile; per-head
64-column value slices happen on VMEM values, not refs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads, sm_scale):
    q = q_ref[0]  # (bq, C)
    k = k_ref[0]  # (sk, C)
    v = v_ref[0]
    d = q.shape[-1] // num_heads
    outs = []
    for h in range(num_heads):
        qh = jax.lax.slice_in_dim(q, h * d, (h + 1) * d, axis=1)
        kh = jax.lax.slice_in_dim(k, h * d, (h + 1) * d, axis=1)
        vh = jax.lax.slice_in_dim(v, h * d, (h + 1) * d, axis=1)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, sk) — lives in VMEM only
        s = s * sm_scale
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o / l)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _forward(q, k, v, num_heads, block_q, interpret):
    b, sq, c = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    assert sq % block_q == 0, (sq, block_q)
    d = c // num_heads
    grid = (b, sq // block_q)
    kernel = functools.partial(
        _packed_kernel, num_heads=num_heads, sm_scale=1.0 / (d**0.5)
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, sk, k.shape[-1]), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, sk, k.shape[-1]), lambda bi, i: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sq * sk * c,
            bytes_accessed=(2 * b * sq * c + 2 * b * sk * c) * q.dtype.itemsize,
            transcendentals=b * num_heads * sq * sk,
        ),
        interpret=interpret,
    )(q, k, v)


def _xla_reference(q, k, v, num_heads):
    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // num_heads
    out = jax.nn.dot_product_attention(
        q.reshape(b, sq, num_heads, d),
        k.reshape(b, sk, num_heads, d),
        v.reshape(b, sk, num_heads, d),
    )
    return out.reshape(b, sq, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def packed_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    block_q: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Multi-head attention on packed (B, S, heads*head_dim) tensors.

    Inference-path kernel; the backward pass recomputes through the XLA
    fused attention (numerically exact, keeps training unchanged).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu" or not _HAS_PLTPU
    return _forward(q, k, v, num_heads, block_q, interpret)


def _fwd(q, k, v, num_heads, block_q, interpret):
    return packed_flash_attention(q, k, v, num_heads, block_q, interpret), (
        q, k, v,
    )


def _bwd(num_heads, block_q, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, num_heads), q, k, v)
    return vjp(g)


packed_flash_attention.defvjp(_fwd, _bwd)
