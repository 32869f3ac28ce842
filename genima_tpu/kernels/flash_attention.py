"""Pallas TPU flash attention (non-causal) for the SD UNet/ControlNet.

Replaces the reference's xformers memory-efficient attention
(``train_controlnet_genima.py:1112-1130``) on the Genima workload: self
attention over the 2x2-tiled latent grid (4096/1024/256 tokens, head dim 64)
and cross attention against 77 CLIP tokens.

Kernel: grid (batch*heads, q_blocks, k_blocks) with online-softmax
accumulators in VMEM scratch (m/l stats + f32 accumulator); k-padding masked
with a static-length comparison; output written on the last k block. Falls
back to XLA fused attention off-TPU; training uses a custom VJP whose
backward recomputes through the XLA path (inference is the latency
north-star; the backward stays numerically exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

_NEG_INF = -1e30
_LANES = 128


def _xla_attention(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, sm_scale, kv_len,
    block_k,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)
    s = s * sm_scale

    # mask padded keys (kv_len is static)
    k_global = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, dimension=1
    )
    s = jnp.where(k_global < kv_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]  # (block_q, 1)
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (block_q, block_k)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _flash_forward(
    q: jax.Array, k: jax.Array, v: jax.Array, block_q: int, block_k: int,
    interpret: bool,
) -> jax.Array:
    """q: (BH, Sq, D); k/v: (BH, Sk, D). TPU block tiling requires the last
    two block dims aligned (8, 128) or full — the head axis therefore folds
    into the batch grid axis, with one transpose at the boundary (XLA fuses
    it into the surrounding projection matmuls)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    sm_scale = 1.0 / (d**0.5)

    # pad sequences to block multiples (kv padding masked in-kernel; q padding
    # sliced off after)
    pad_q = (-sq) % block_q
    pad_k = (-sk) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    sq_p, sk_p = q.shape[1], k.shape[1]

    grid = (bh, sq_p // block_q, sk_p // block_k)
    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, kv_len=sk, block_k=block_k
    )
    kwargs = dict(memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((block_q, d), jnp.float32),
        pltpu.VMEM((block_q, _LANES), jnp.float32),
        pltpu.VMEM((block_q, _LANES), jnp.float32),
    ]

    def q_index(bi, qi, ki):
        return (bi, qi, 0)

    def kv_index(bi, qi, ki):
        return (bi, ki, 0)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), q_index, **kwargs),
            pl.BlockSpec((1, block_k, d), kv_index, **kwargs),
            pl.BlockSpec((1, block_k, d), kv_index, **kwargs),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), q_index, **kwargs),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, k, v)
    return out[:, :sq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, block_q, block_k, interpret):
    return _flash_forward(q, k, v, block_q, block_k, interpret)


def _flash_fwd(q, k, v, block_q, block_k, interpret):
    return _flash_forward(q, k, v, block_q, block_k, interpret), (q, k, v)


def _flash_bwd(block_q, block_k, interpret, res, g):
    """Backward through the XLA reference implementation (exact gradients;
    the inference path is the latency target)."""
    q, k, v = res

    def ref(q, k, v):
        out = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )
        return out[:, :, 0, :]

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,  # (B, Sq, H, D)
    k: jax.Array,  # (B, Sk, H, D)
    v: jax.Array,
    block_q: int = 256,
    block_k: int = 512,
) -> jax.Array:
    """Drop-in for jax.nn.dot_product_attention (non-causal, no mask)."""
    on_tpu = _HAS_PLTPU and any(
        d.platform == "tpu" or "axon" in d.platform.lower()
        for d in jax.devices()
    )
    interpret = not on_tpu
    if not _HAS_PLTPU:
        return _xla_attention(q, k, v)
    b, sq, h, d = q.shape
    sk = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    out = _flash(qf, kf, vf, block_q, block_k, interpret)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
