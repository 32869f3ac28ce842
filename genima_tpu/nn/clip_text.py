"""CLIP text transformer in Flax.

One module covers all four CLIP text encoders the reference touches:

* SD-turbo / SD 2.1 prompt encoder (hidden 1024, 23 layers, gelu) —
  ``train_controlnet_genima.py:1042-1047``;
* SDXL dual encoders (768/12/quick_gelu + 1280/32/gelu with projection,
  penultimate hidden states concatenated, pooled from encoder 2) —
  ``train_controlnet_sdxl_genima.py:854-893``;
* OpenAI CLIP ViT-B/32 text tower (512/12/quick_gelu with projection) used
  for the controller's language conditioning —
  ``controller/method/genima_act.py:314-346``.

The forward returns last/penultimate hidden states, pooled output and the
projected embedding in one pass, so each variant just picks its field.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 23
    num_heads: int = 16
    max_positions: int = 77
    hidden_act: str = "gelu"  # or "quick_gelu"
    projection_dim: int | None = None

    @staticmethod
    def sd21(**kw) -> "CLIPTextConfig":
        """stabilityai/sd-turbo text_encoder (OpenCLIP ViT-H, truncated)."""
        return CLIPTextConfig(**kw)

    @staticmethod
    def sd15(**kw) -> "CLIPTextConfig":
        return CLIPTextConfig(
            hidden_size=768, intermediate_size=3072, num_layers=12, num_heads=12,
            hidden_act="quick_gelu", **kw,
        )

    @staticmethod
    def sdxl_one(**kw) -> "CLIPTextConfig":
        return CLIPTextConfig.sd15(**kw)

    @staticmethod
    def sdxl_two(**kw) -> "CLIPTextConfig":
        return CLIPTextConfig(
            hidden_size=1280, intermediate_size=5120, num_layers=32, num_heads=20,
            hidden_act="gelu", projection_dim=1280, **kw,
        )

    @staticmethod
    def vit_b_32(**kw) -> "CLIPTextConfig":
        """OpenAI CLIP ViT-B/32 text tower (controller language embedding)."""
        return CLIPTextConfig(
            hidden_size=512, intermediate_size=2048, num_layers=12, num_heads=8,
            hidden_act="quick_gelu", projection_dim=512, **kw,
        )

    @staticmethod
    def tiny(**kw) -> "CLIPTextConfig":
        defaults = dict(
            vocab_size=1000, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=2, projection_dim=32,
        )
        defaults.update(kw)
        return CLIPTextConfig(**defaults)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        b, s, _ = x.shape
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, s, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(head_dim).astype(
            q.dtype
        )
        scores = scores + mask.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        c = self.cfg
        # HF "gelu" is the exact erf form, not the tanh approximation
        act = (
            quick_gelu
            if c.hidden_act == "quick_gelu"
            else lambda x: nn.gelu(x, approximate=False)
        )
        # HF CLIP layer_norm_eps = 1e-5 (flax defaults to 1e-6 — pinned by the
        # real-transformers golden test in tests/test_weights.py)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(c, dtype=self.dtype, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = act(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextOutput(NamedTuple):
    last_hidden_state: jax.Array  # after final_layer_norm
    penultimate_hidden_state: jax.Array  # hidden_states[-2], pre final LN
    pooled_output: jax.Array  # last_hidden_state at EOT position
    text_embeds: jax.Array | None  # pooled @ text_projection (if configured)


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> CLIPTextOutput:
        c = self.cfg
        b, s = input_ids.shape
        # clamp: out-of-range ids (e.g. the hash-fallback tokenizer against a
        # tiny test vocab) must not produce non-finite embeddings
        safe_ids = jnp.clip(input_ids, 0, c.vocab_size - 1)
        tok = nn.Embed(
            c.vocab_size, c.hidden_size, dtype=self.dtype, name="token_embedding"
        )(safe_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (c.max_positions, c.hidden_size),
        )
        x = tok + pos[None, :s].astype(self.dtype)
        causal = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]
        hidden = x
        penultimate = x
        for i in range(c.num_layers):
            if i == c.num_layers - 1:
                penultimate = hidden
            hidden = CLIPEncoderLayer(c, dtype=self.dtype, name=f"layers_{i}")(
                hidden, causal
            )
        last = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, name="final_layer_norm"
        )(hidden)
        # EOT pooling: argmax over ids (EOT has the highest id in CLIP vocab)
        eot_idx = jnp.argmax(input_ids, axis=-1)
        pooled = last[jnp.arange(b), eot_idx]
        text_embeds = None
        if c.projection_dim is not None:
            text_embeds = nn.Dense(
                c.projection_dim, use_bias=False, dtype=self.dtype,
                name="text_projection",
            )(pooled)
        return CLIPTextOutput(last, penultimate, pooled, text_embeds)
