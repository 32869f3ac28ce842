"""Blockwise 8-bit AdamW (optax transformation).

TPU-native replacement for the reference's bitsandbytes ``--use_8bit_adam``
knob (``diffusion/train_controlnet_genima.py:996-1012``): both Adam moments
are stored as int8 with per-block f32 absmax scales (bnb's blockwise
dynamic-quantization idea, arXiv:2110.02861, re-derived for XLA). The
dequantize -> update -> requantize round trip happens inside the jitted
training step, so the HBM-resident optimizer state drops from 8 bytes/param
to ~2.03 bytes/param (block 256) — on the SD ControlNet fine-tune (~364M
trainable params) that is ~2.2 GB -> ~0.74 GB.

Quantization: symmetric linear int8 per block for the first moment; the
second moment is non-negative, so it quantizes on a sqrt scale (uint-like
int8 of sqrt(v)/absmax(sqrt(v))), which keeps the relative error of
sqrt(v_hat) — the quantity the update actually uses — uniform. Params
smaller than ``min_quantized_size`` keep f32 moments (bnb does the same for
small tensors, where blockwise overhead dominates).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _Quantized(NamedTuple):
    q: jax.Array  # int8 codes
    scale: jax.Array  # (nblocks,) f32 absmax scales


class _Moment(NamedTuple):
    """Either quantized (q/scale set, full None) or full-precision."""

    q: jax.Array | None
    scale: jax.Array | None
    full: jax.Array | None


class Adam8bitState(NamedTuple):
    count: jax.Array
    mu: object  # pytree of _Moment
    nu: object  # pytree of _Moment


def _quantize(x: jax.Array, block: int) -> _Quantized:
    flat = x.reshape(-1)
    pad = (-flat.size) % block
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    scale = jnp.max(jnp.abs(blocks), axis=1) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(blocks / safe[:, None]), -127, 127).astype(jnp.int8)
    return _Quantized(q, scale.astype(jnp.float32))


def _dequantize(qv: _Quantized, shape, block: int) -> jax.Array:
    flat = (qv.q.astype(jnp.float32) * qv.scale[:, None]).reshape(-1)
    n = 1
    for s in shape:
        n *= s
    return flat[:n].reshape(shape)


def adamw_8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    block_size: int = 256,
    min_quantized_size: int = 4096,
) -> optax.GradientTransformation:
    """AdamW with int8 blockwise-quantized moments (decoupled weight decay,
    bias correction — same math as ``optax.adamw`` up to quantization)."""

    def _store_m(m):
        if m.size < min_quantized_size:
            return _Moment(None, None, m)
        q = _quantize(m, block_size)
        return _Moment(q.q, q.scale, None)

    def _store_v(v):
        if v.size < min_quantized_size:
            return _Moment(None, None, v)
        q = _quantize(jnp.sqrt(v), block_size)
        return _Moment(q.q, q.scale, None)

    def _load_m(st: _Moment, shape):
        if st.full is not None:
            return st.full
        return _dequantize(_Quantized(st.q, st.scale), shape, block_size)

    def _load_v(st: _Moment, shape):
        if st.full is not None:
            return st.full
        r = _dequantize(_Quantized(st.q, st.scale), shape, block_size)
        return r * r

    def init(params):
        # separate zero allocations per moment: the state lives inside a
        # donated TrainState, and aliased buffers donate twice
        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(
                lambda p: _store_m(jnp.zeros(p.shape, jnp.float32)), params
            ),
            nu=jax.tree_util.tree_map(
                lambda p: _store_v(jnp.zeros(p.shape, jnp.float32)), params
            ),
        )

    def update(grads, state: Adam8bitState, params=None):
        if params is None:
            raise ValueError("adamw_8bit needs params (weight decay)")
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        is_moment = lambda x: isinstance(x, _Moment)  # noqa: E731

        def upd(g, p, m_st, v_st):
            g = g.astype(jnp.float32)
            m = b1 * _load_m(m_st, g.shape) + (1.0 - b1) * g
            v = b2 * _load_v(v_st, g.shape) + (1.0 - b2) * g * g
            mhat = m / c1
            vhat = v / c2
            step = mhat / (jnp.sqrt(vhat) + eps) + weight_decay * p.astype(
                jnp.float32
            )
            return (-lr * step).astype(p.dtype), _store_m(m), _store_v(v)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_p = jax.tree_util.tree_flatten(params)[0]
        flat_m = jax.tree_util.tree_flatten(state.mu, is_leaf=is_moment)[0]
        flat_v = jax.tree_util.tree_flatten(state.nu, is_leaf=is_moment)[0]
        outs = [upd(g, p, m, v)
                for g, p, m, v in zip(flat_g, flat_p, flat_m, flat_v)]
        updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
        mu = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])
        nu = jax.tree_util.tree_unflatten(treedef, [o[2] for o in outs])
        return updates, Adam8bitState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def optimizer_state_bytes(state) -> int:
    """HBM footprint of an optimizer state pytree (diagnostics)."""
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(state)
        if hasattr(leaf, "dtype")
    )
