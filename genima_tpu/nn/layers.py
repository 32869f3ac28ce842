"""Shared building blocks for the SD UNet / ControlNet / VAE in Flax.

These reimplement the *architecture* of the diffusers modules the reference
depends on (``diffusers.UNet2DConditionModel`` etc., pinned 0.29.0 per
reference ``pyproject.toml:24``) as TPU-first Flax modules:

* NHWC layout end-to-end (TPU conv-native),
* compute dtype (bf16) separated from parameter dtype (f32),
* attention through a swappable backend — XLA fused attention by default,
  the Pallas flash kernel (``genima_tpu.kernels.flash_attention``) on TPU,
* module/parameter naming mirrors the diffusers checkpoint tree so the
  torch->flax weight port (``genima_tpu.weights``) is a pure rename+transpose.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

def group_norm(channels: int, eps: float, dtype, name: str) -> nn.GroupNorm:
    """GroupNorm(32) as in SD; falls back to a divisor for tiny test widths."""
    import math

    groups = 32 if channels % 32 == 0 else math.gcd(channels, 32)
    return nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=dtype, name=name)


# ---------------------------------------------------------------------------
# timestep embeddings
# ---------------------------------------------------------------------------


def get_timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal timestep embedding, diffusers convention (SD uses
    flip_sin_to_cos=True, freq_shift=0)."""
    half_dim = embedding_dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    """MLP over the sinusoidal embedding: linear -> silu -> linear."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(sample)
        x = nn.silu(x)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(x)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def _xla_attention(q, k, v):
    """Fused scaled-dot-product attention via XLA. q,k,v: (B, S, H, D)."""
    return jax.nn.dot_product_attention(q, k, v)


def _pallas_attention(q, k, v):
    from genima_tpu.kernels.flash_attention import flash_attention

    return flash_attention(q, k, v)


_ATTN_BACKENDS: dict[str, Callable] = {
    "xla": _xla_attention,
    "pallas": _pallas_attention,
}

# 'fused' backend: self-attention sequences at least this long go through the
# packed Pallas kernel (kernels/packed_attention.py). Below it the score
# matrix is small enough that XLA keeps it on-chip anyway — the 4096/1024
# token levels are where XLA spills f32 logits to HBM. In-program A/B on
# v5e (scripts/ab_fused_attn.py): xla 20.9 ms/denoise-step, fused>=1024
# 16.6, fused>=256 16.5.
FUSED_MIN_SEQ = 256


def split_backend(spec: str) -> tuple[str, bool]:
    """A backend spec is ``<attn>[+w8]``: the attention backend, optionally
    with int8 weight-only matmuls ('fused+w8'). Returns (attn_backend, w8)."""
    if spec.endswith("+w8"):
        return spec[: -len("+w8")], True
    return spec, False


def resolve_backend(backend: str, is_cross: bool) -> str:
    """'pallas_self'/'fused' route self-attention through a flash kernel
    while cross-attention (77 kv tokens — too small to win) stays on XLA."""
    backend, _ = split_backend(backend)
    if backend == "pallas_self":
        return "xla" if is_cross else "pallas"
    if backend == "fused":
        return "xla" if is_cross else "fused"
    return backend


class W8Dense(nn.Module):
    """Dense with int8 weight-only storage (kernels/w8_matmul.py).

    Params: ``kernel_q`` int8 (K, N), ``scale`` f32 (N,), optional ``bias``
    — produced from a full-precision checkpoint by
    ``weights/quantize.py::quantize_dense_tree``; from-scratch init gives
    identity-zero weights (bench timing is value-independent)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from genima_tpu.kernels.w8_matmul import w8_matmul

        k = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", nn.initializers.zeros, (k, self.features), jnp.int8
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        y = w8_matmul(x.astype(self.dtype), kernel_q, scale)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y


def make_dense(w8: bool, features: int, use_bias: bool, dtype, name: str):
    """nn.Dense or its int8 weight-only twin, same call signature."""
    if w8:
        return W8Dense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class Attention(nn.Module):
    """Multi-head (self or cross) attention, diffusers ``Attention`` layout.

    Replaces the reference's xformers memory-efficient attention
    (``train_controlnet_genima.py:1112-1130``) with XLA fused attention or
    the Pallas flash kernel.
    """

    query_dim: int
    heads: int
    cross_attention_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    backend: str = "xla"

    @nn.compact
    def __call__(
        self, hidden_states: jax.Array, context: Optional[jax.Array] = None
    ) -> jax.Array:
        context = hidden_states if context is None else context
        inner_dim = self.query_dim
        head_dim = inner_dim // self.heads
        _, w8 = split_backend(self.backend)
        dense = lambda name, feats: make_dense(  # noqa: E731
            w8, feats, False, self.dtype, name
        )
        q = dense("to_q", inner_dim)(hidden_states)
        k = dense("to_k", inner_dim)(context)
        v = dense("to_v", inner_dim)(context)

        b, sq, _ = q.shape
        sk = k.shape[1]
        backend = resolve_backend(
            self.backend, self.cross_attention_dim is not None
        )
        if backend == "fused" and sq >= FUSED_MIN_SEQ and sq % 128 == 0:
            # packed kernel consumes the projection outputs directly —
            # no (S,H,D) transposes at the kernel boundary
            from genima_tpu.kernels.packed_attention import (
                packed_flash_attention,
            )

            out = packed_flash_attention(q, k, v, self.heads)
        else:
            if backend == "fused":
                backend = "xla"
            qh = q.reshape(b, sq, self.heads, head_dim)
            kh = k.reshape(b, sk, self.heads, head_dim)
            vh = v.reshape(b, sk, self.heads, head_dim)
            out = _ATTN_BACKENDS[backend](qh, kh, vh)
            out = out.reshape(b, sq, inner_dim)
        return make_dense(w8, inner_dim, True, self.dtype, "to_out_0")(out)


class GEGLU(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.float32
    w8: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = make_dense(self.w8, self.inner_dim * 2, True, self.dtype, "proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU uses exact (erf) gelu
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    w8: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, w8=self.w8,
                  name="net_0")(x)
        return make_dense(self.w8, self.dim, True, self.dtype, "net_2")(x)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    cross_attention_dim: int
    dtype: jnp.dtype = jnp.float32
    backend: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        # diffusers BasicTransformerBlock norm_eps = 1e-5 (torch LayerNorm
        # default); flax would silently use 1e-6
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-5, dtype=self.dtype, name=name
        )
        attn = lambda name, cross_dim: Attention(  # noqa: E731
            query_dim=self.dim,
            heads=self.heads,
            cross_attention_dim=cross_dim,
            dtype=self.dtype,
            backend=self.backend,
            name=name,
        )
        x = x + attn("attn1", None)(ln("norm1")(x))
        x = x + attn("attn2", self.cross_attention_dim)(ln("norm2")(x), context)
        x = x + FeedForward(
            self.dim, dtype=self.dtype, w8=split_backend(self.backend)[1],
            name="ff",
        )(ln("norm3")(x))
        return x


class Transformer2DModel(nn.Module):
    """Spatial transformer wrapping BasicTransformerBlocks, NHWC."""

    in_channels: int
    heads: int
    cross_attention_dim: int
    num_layers: int = 1
    use_linear_projection: bool = True  # SD2.x / SDXL
    dtype: jnp.dtype = jnp.float32
    backend: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        w8 = split_backend(self.backend)[1]
        x = group_norm(c, 1e-6, self.dtype, "norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = make_dense(w8, c, True, self.dtype, "proj_in")(x)
        else:
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, c)
        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                dim=c,
                heads=self.heads,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                backend=self.backend,
                name=f"transformer_blocks_{i}",
            )(x, context)
        if self.use_linear_projection:
            x = make_dense(w8, c, True, self.dtype, "proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, c)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


# ---------------------------------------------------------------------------
# resnet blocks and up/down sampling
# ---------------------------------------------------------------------------


class ResnetBlock2D(nn.Module):
    out_channels: int
    use_time_emb: bool = True
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, temb: Optional[jax.Array] = None
    ) -> jax.Array:
        in_channels = x.shape[-1]
        h = group_norm(in_channels, self.eps, self.dtype, "norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1"
        )(h)
        if self.use_time_emb and temb is not None:
            temb_proj = nn.Dense(
                self.out_channels, dtype=self.dtype, name="time_emb_proj"
            )(nn.silu(temb))
            h = h + temb_proj[:, None, None, :]
        h = group_norm(self.out_channels, self.eps, self.dtype, "norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2"
        )(h)
        if in_channels != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.out_channels, (3, 3), strides=2, padding=1, dtype=self.dtype,
            name="conv",
        )(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv"
        )(x)
