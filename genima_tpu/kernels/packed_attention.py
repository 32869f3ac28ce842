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


def _resident_vmem_bytes(b, sq, sk, c, block_q, itemsize):
    """Scoped-VMEM estimate for the resident-K/V kernel.

    The full K/V live in VMEM per grid step. With b == 1 their block index
    is constant across the whole grid, so Mosaic keeps a single buffer;
    with b > 1 the K/V blocks vary along the batch grid dim and get
    double-buffered — measured on v5e this pushes the 4096x320 SD level
    from ~11.7 MB (fits) to 16.8 MB (over the 16 MB scoped limit)."""
    bq = min(block_q, sq)
    kv = 2 * sk * c * itemsize * (2 if b > 1 else 1)
    qo = 2 * bq * c * itemsize * 2  # q + out blocks, double-buffered
    scores = bq * sk * 4 * 2  # f32 scores + exp'd copy
    acc = bq * c * 4
    return kv + qo + scores + acc


def _streaming_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
    *, num_heads, sm_scale, n_kb
):
    """Online-softmax forward: K/V stream through VMEM in blocks along a
    third grid dim, so the working set is bounded by the block sizes —
    independent of batch and kv length. Used when the resident-K/V kernel
    would exceed the scoped-VMEM limit (batched serving, very long rows)."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]      # (bq, C)
    kblk = k_ref[0]   # (bk, C)
    vblk = v_ref[0]
    d = q.shape[-1] // num_heads
    m_all = m_ref[...]    # (bq, H) f32 running row max per head
    l_all = l_ref[...]    # (bq, H) f32 running normalizer
    acc = acc_ref[...]    # (bq, C) f32 unnormalized output
    new_m, new_l, new_acc, outs = [], [], [], []
    for h in range(num_heads):
        qh = jax.lax.slice_in_dim(q, h * d, (h + 1) * d, axis=1)
        kh = jax.lax.slice_in_dim(kblk, h * d, (h + 1) * d, axis=1)
        vh = jax.lax.slice_in_dim(vblk, h * d, (h + 1) * d, axis=1)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # (bq, bk)
        m_prev = jax.lax.slice_in_dim(m_all, h, h + 1, axis=1)
        l_prev = jax.lax.slice_in_dim(l_all, h, h + 1, axis=1)
        acc_h = jax.lax.slice_in_dim(acc, h * d, (h + 1) * d, axis=1)
        m_nx = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_nx)
        p = jnp.exp(s - m_nx)
        l_nx = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vblk.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_nx = acc_h * alpha + o
        new_m.append(m_nx)
        new_l.append(l_nx)
        new_acc.append(acc_nx)
        outs.append(acc_nx / l_nx)
    m_ref[...] = jnp.concatenate(new_m, axis=-1)
    l_ref[...] = jnp.concatenate(new_l, axis=-1)
    acc_ref[...] = jnp.concatenate(new_acc, axis=-1)

    @pl.when(kb == n_kb - 1)
    def _emit():
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _forward_streaming(q, k, v, num_heads, block_q, interpret, block_k=1024):
    b, sq, c = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    assert sq % block_q == 0 and sk % block_k == 0, (sq, block_q, sk, block_k)
    d = c // num_heads
    n_kb = sk // block_k
    grid = (b, sq // block_q, n_kb)
    kernel = functools.partial(
        _streaming_kernel,
        num_heads=num_heads,
        sm_scale=1.0 / (d**0.5),
        n_kb=n_kb,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda bi, i, kb: (bi, i, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, i, kb: (bi, kb, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, i, kb: (bi, kb, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda bi, i, kb: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq, c), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, c), jnp.float32),
            pltpu.VMEM((block_q, num_heads), jnp.float32),
            pltpu.VMEM((block_q, num_heads), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sq * sk * c,
            bytes_accessed=(2 * b * sq * c + 2 * b * sk * c) * q.dtype.itemsize,
            transcendentals=b * num_heads * sq * sk,
        ),
        interpret=interpret,
    )(q, k, v)


def _forward(q, k, v, num_heads, block_q, interpret):
    b, sq, c = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    assert sq % block_q == 0, (sq, block_q)
    d = c // num_heads
    if (
        _HAS_PLTPU
        and _resident_vmem_bytes(b, sq, sk, c, block_q, q.dtype.itemsize)
        > 14 * 2**20
        and sk % min(1024, sk) == 0
    ):
        return _forward_streaming(q, k, v, num_heads, block_q, interpret)
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


# ---------------------------------------------------------------------------
# training path: forward that also emits the per-row log-sum-exp, and a
# Pallas backward (the round-2 "flash backward" gap, PARITY.md)
# ---------------------------------------------------------------------------


def _packed_kernel_lse(
    q_ref, k_ref, v_ref, o_ref, l_ref, *, num_heads, sm_scale
):
    """Forward block identical to ``_packed_kernel`` but also writes
    L = m + log(l) per (row, head) — the softmax normalizer the flash
    backward needs to rebuild P without a second max/sum pass."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    d = q.shape[-1] // num_heads
    outs, lses = [], []
    for h in range(num_heads):
        qh = jax.lax.slice_in_dim(q, h * d, (h + 1) * d, axis=1)
        kh = jax.lax.slice_in_dim(k, h * d, (h + 1) * d, axis=1)
        vh = jax.lax.slice_in_dim(v, h * d, (h + 1) * d, axis=1)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * sm_scale
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o / l)
        lses.append(m + jnp.log(l))  # (bq, 1)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)
    l_ref[0] = jnp.concatenate(lses, axis=-1)  # (bq, H) f32


def _forward_with_lse(q, k, v, num_heads, block_q, interpret):
    b, sq, c = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    assert sq % block_q == 0, (sq, block_q)
    d = c // num_heads
    grid = (b, sq // block_q)
    kernel = functools.partial(
        _packed_kernel_lse, num_heads=num_heads, sm_scale=1.0 / (d**0.5)
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, sk, c), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, sk, c), lambda bi, i: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, c), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, block_q, num_heads), lambda bi, i: (bi, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, c), q.dtype),
            jax.ShapeDtypeStruct((b, sq, num_heads), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sq * sk * c,
            bytes_accessed=(2 * b * sq * c + 2 * b * sk * c) * q.dtype.itemsize,
            transcendentals=b * num_heads * sq * sk,
        ),
        interpret=interpret,
    )(q, k, v)


def _bwd_kernel(q_ref, do_ref, l_ref, dr_ref, k_ref, v_ref,
                dq_ref, dk_ref, dv_ref, *, sm_scale, n_kb):
    """Flash backward for one (batch*head, k-block) grid step.

    q/do are (S, D) resident; k/v stream (bk, D) blocks; dq is a revisited
    f32 output block accumulated across the k grid dimension; dk/dv are
    written per block. L (log-sum-exp) and Drow (rowsum(do*o)) arrive
    precomputed per row."""
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    q = q_ref[0]            # (S, D) bf16
    do = do_ref[0]          # (S, D)
    kblk = k_ref[0]         # (bk, D)
    vblk = v_ref[0]
    lse = l_ref[0].reshape(-1, 1)   # (1, 1, S) block -> (S, 1) f32
    drow = dr_ref[0].reshape(-1, 1)

    s = jax.lax.dot_general(
        q, kblk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale                       # (S, bk)
    p = jnp.exp(s - lse)               # normalized probabilities
    pb = p.astype(q.dtype)
    # dv_blk = P^T @ do
    dv_ref[0] = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    # dP = do @ v^T ; dS = P * (dP - Drow) * scale
    dp = jax.lax.dot_general(
        do, vblk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - drow) * sm_scale).astype(q.dtype)  # (S, bk)
    # dq += dS @ k_blk
    dq_ref[0] += jax.lax.dot_general(
        ds, kblk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dk_blk = dS^T @ q
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _flash_backward(q, k, v, o, lse, do, num_heads, interpret, block_k=128):
    """dq, dk, dv on packed (B, S, C) tensors via the Pallas backward."""
    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // num_heads
    bh = b * num_heads

    def to_bh(x, s):
        # (B, S, H, D) -> (B, H, S, D) -> (BH, S, D)
        return (
            x.reshape(b, s, num_heads, d)
            .transpose(0, 2, 1, 3)
            .reshape(bh, s, d)
        )

    qb = to_bh(q, sq)
    kb_ = to_bh(k, sk)
    vb = to_bh(v, sk)
    dob = to_bh(do.astype(q.dtype), sq)
    ob = to_bh(o, sq)
    # L arrives (B, S, H) -> (BH, 1, S) (the extra middle dim keeps the
    # block's last-two dims tile-legal: (1, S))
    lb = lse.transpose(0, 2, 1).reshape(bh, 1, sq)
    drow = jnp.sum(
        dob.astype(jnp.float32) * ob.astype(jnp.float32), axis=-1
    ).reshape(bh, 1, sq)

    n_kb = sk // block_k
    kernel = functools.partial(
        _bwd_kernel, sm_scale=1.0 / (d**0.5), n_kb=n_kb
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh, n_kb),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda bi, kb: (bi, 0, 0)),
            pl.BlockSpec((1, sq, d), lambda bi, kb: (bi, 0, 0)),
            pl.BlockSpec((1, 1, sq), lambda bi, kb: (bi, 0, 0)),
            pl.BlockSpec((1, 1, sq), lambda bi, kb: (bi, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda bi, kb: (bi, kb, 0)),
            pl.BlockSpec((1, block_k, d), lambda bi, kb: (bi, kb, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, sq, d), lambda bi, kb: (bi, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda bi, kb: (bi, kb, 0)),
            pl.BlockSpec((1, block_k, d), lambda bi, kb: (bi, kb, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, sk, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), q.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * sq * sk * d,
            bytes_accessed=(4 * bh * sq * d + 4 * bh * sk * d)
            * q.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
        interpret=interpret,
    )(qb, dob, lb, drow, kb_, vb)

    def from_bh(x, s):
        return (
            x.reshape(b, num_heads, s, d)
            .transpose(0, 2, 1, 3)
            .reshape(b, s, num_heads * d)
        )

    return (
        from_bh(dq.astype(q.dtype), sq),
        from_bh(dk, sk),
        from_bh(dv, sk),
    )


def _bwd_kernel_applicable(q, k, block_q, num_heads, block_k=128):
    b, sq, c = q.shape
    sk = k.shape[1]
    if sk % block_k != 0 or sq % min(block_q, sq) != 0:
        return False
    # q/do resident per (batch*head): bound VMEM (f32 dq block + temps)
    # using the REAL head dim — a hardcoded 64 under-counted for configs
    # with head_dim > 64, selecting the kernel only to fail at Mosaic
    # compile time instead of falling back to the XLA recompute
    d_ = c // num_heads
    vmem = sq * d_ * (2 + 2 + 4) + 3 * sq * block_k * 4
    return vmem <= 12 * 2 ** 20


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

    Training: the forward under grad also emits the per-row log-sum-exp and
    the backward runs as a Pallas flash kernel (k-blocked, dq accumulated
    across the k grid dimension) — the score matrices never touch HBM in
    either direction. Shapes the backward can't tile (kv=77
    cross-attention, very long rows) recompute through XLA instead.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu" or not _HAS_PLTPU
    return _forward(q, k, v, num_heads, block_q, interpret)


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu" or not _HAS_PLTPU
    return interpret


def _fwd(q, k, v, num_heads, block_q, interpret):
    if _bwd_kernel_applicable(q, k, block_q, num_heads):
        o, lse = _forward_with_lse(
            q, k, v, num_heads, block_q, _resolve_interpret(interpret)
        )
        return o, (q, k, v, o, lse)
    return packed_flash_attention(q, k, v, num_heads, block_q, interpret), (
        q, k, v, None, None,
    )


def _bwd(num_heads, block_q, interpret, res, g):
    q, k, v, o, lse = res
    if lse is not None:
        return _flash_backward(
            q, k, v, o, lse, g, num_heads, _resolve_interpret(interpret)
        )
    _, vjp = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, num_heads), q, k, v)
    return vjp(g)


packed_flash_attention.defvjp(_fwd, _bwd)
