"""UNet2DCondition in Flax — the SD-turbo / SDXL / InstructPix2Pix backbone.

TPU-first reimplementation of the architecture behind diffusers
``UNet2DConditionModel`` (the frozen epsilon-predictor in the reference's
ControlNet fine-tune, ``diffusion/train_controlnet_genima.py:1042-1064``, and
the trainable model in the pix2pix variant). NHWC layout, bf16 compute,
attention backend swappable to the Pallas flash kernel. Supports:

* ControlNet residual injection (``down_block_additional_residuals`` /
  ``mid_block_additional_residual``, reference ``:1377-1388``),
* SDXL micro-conditioning (``addition_embed_type='text_time'``: pooled text
  embeds + 6 time_ids, reference ``train_controlnet_sdxl_genima.py:1232``),
* 8-channel input for InstructPix2Pix conditioning-concat
  (``train_instruct_pix2pix_genima.py:1196-1236``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from genima_tpu.nn.layers import (
    Downsample2D,
    group_norm,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2DModel,
    Upsample2D,
    get_timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    # True at index i => CrossAttnDownBlock2D, else DownBlock2D. Up path is
    # the reverse.
    down_block_has_attn: Sequence[bool] = (True, True, True, False)
    layers_per_block: int = 2
    num_heads: Sequence[int] = (5, 10, 20, 20)
    transformer_layers_per_block: Sequence[int] = (1, 1, 1, 1)
    cross_attention_dim: int = 1024
    use_linear_projection: bool = True
    # SDXL "text_time" micro-conditioning
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0

    @staticmethod
    def sd21(**kw) -> "UNetConfig":
        """stabilityai/sd-turbo == distilled SD 2.1 base (512px)."""
        return UNetConfig(**kw)

    @staticmethod
    def sd15(**kw) -> "UNetConfig":
        return UNetConfig(
            cross_attention_dim=768,
            num_heads=(8, 8, 8, 8),
            use_linear_projection=False,
            **kw,
        )

    @staticmethod
    def sdxl(**kw) -> "UNetConfig":
        """stabilityai/sdxl-turbo UNet."""
        return UNetConfig(
            sample_size=64,
            block_out_channels=(320, 640, 1280),
            down_block_has_attn=(False, True, True),
            num_heads=(5, 10, 20),
            transformer_layers_per_block=(1, 2, 10),
            cross_attention_dim=2048,
            addition_embed_type="text_time",
            projection_class_embeddings_input_dim=2816,
            **kw,
        )

    @staticmethod
    def pix2pix(**kw) -> "UNetConfig":
        """InstructPix2Pix: 8-channel input (latents ++ image cond)."""
        return UNetConfig(in_channels=8, **kw)

    @staticmethod
    def tiny(**kw) -> "UNetConfig":
        """Small config for tests."""
        defaults = dict(
            sample_size=8,
            block_out_channels=(32, 64),
            down_block_has_attn=(True, False),
            layers_per_block=1,
            num_heads=(2, 2),
            transformer_layers_per_block=(1, 1),
            cross_attention_dim=32,
        )
        defaults.update(kw)
        return UNetConfig(**defaults)


class CrossAttnDownBlock2D(nn.Module):
    cfg: UNetConfig
    out_channels: int
    level: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32
    backend: str = "xla"

    @nn.compact
    def __call__(self, x, temb, context):
        outputs = []
        for i in range(self.cfg.layers_per_block):
            x = ResnetBlock2D(
                self.out_channels, dtype=self.dtype, name=f"resnets_{i}"
            )(x, temb)
            x = Transformer2DModel(
                in_channels=self.out_channels,
                heads=self.cfg.num_heads[self.level],
                cross_attention_dim=self.cfg.cross_attention_dim,
                num_layers=self.cfg.transformer_layers_per_block[self.level],
                use_linear_projection=self.cfg.use_linear_projection,
                dtype=self.dtype,
                backend=self.backend,
                name=f"attentions_{i}",
            )(x, context)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(
                self.out_channels, dtype=self.dtype, name="downsamplers_0"
            )(x)
            outputs.append(x)
        return x, outputs


class DownBlock2D(nn.Module):
    cfg: UNetConfig
    out_channels: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        outputs = []
        for i in range(self.cfg.layers_per_block):
            x = ResnetBlock2D(
                self.out_channels, dtype=self.dtype, name=f"resnets_{i}"
            )(x, temb)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample2D(
                self.out_channels, dtype=self.dtype, name="downsamplers_0"
            )(x)
            outputs.append(x)
        return x, outputs


class UNetMidBlock2DCrossAttn(nn.Module):
    cfg: UNetConfig
    channels: int
    dtype: jnp.dtype = jnp.float32
    backend: str = "xla"

    @nn.compact
    def __call__(self, x, temb, context):
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_0")(x, temb)
        x = Transformer2DModel(
            in_channels=self.channels,
            heads=self.cfg.num_heads[-1],
            cross_attention_dim=self.cfg.cross_attention_dim,
            num_layers=self.cfg.transformer_layers_per_block[-1],
            use_linear_projection=self.cfg.use_linear_projection,
            dtype=self.dtype,
            backend=self.backend,
            name="attentions_0",
        )(x, context)
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_1")(x, temb)
        return x


class CrossAttnUpBlock2D(nn.Module):
    cfg: UNetConfig
    out_channels: int
    level: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32
    backend: str = "xla"

    @nn.compact
    def __call__(self, x, skips, temb, context):
        for i in range(self.cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(
                self.out_channels, dtype=self.dtype, name=f"resnets_{i}"
            )(x, temb)
            x = Transformer2DModel(
                in_channels=self.out_channels,
                heads=self.cfg.num_heads[self.level],
                cross_attention_dim=self.cfg.cross_attention_dim,
                num_layers=self.cfg.transformer_layers_per_block[self.level],
                use_linear_projection=self.cfg.use_linear_projection,
                dtype=self.dtype,
                backend=self.backend,
                name=f"attentions_{i}",
            )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class UpBlock2D(nn.Module):
    cfg: UNetConfig
    out_channels: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb):
        for i in range(self.cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(
                self.out_channels, dtype=self.dtype, name=f"resnets_{i}"
            )(x, temb)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


def apply_time_embedding(
    cfg: UNetConfig, dtype, timesteps: jax.Array, added_cond: Optional[dict]
) -> jax.Array:
    """Sinusoidal + MLP time embedding (+ SDXL text_time conditioning).

    A free function creating submodules in the *caller's* compact scope so
    the UNet and the ControlNet get identical parameter subtrees
    (``time_embedding``, ``add_embedding``) — the alignment ``from_unet``
    initialization relies on.
    """
    c0 = cfg.block_out_channels[0]
    time_embed_dim = c0 * 4
    t_emb = get_timestep_embedding(
        timesteps, c0, cfg.flip_sin_to_cos, cfg.freq_shift
    ).astype(dtype)
    emb = TimestepEmbedding(time_embed_dim, dtype=dtype, name="time_embedding")(t_emb)
    if cfg.addition_embed_type == "text_time":
        assert added_cond is not None, "SDXL needs added_cond_kwargs"
        text_embeds = added_cond["text_embeds"]  # (B, pooled_dim)
        time_ids = added_cond["time_ids"]  # (B, 6)
        time_ids_emb = get_timestep_embedding(
            time_ids.reshape(-1),
            cfg.addition_time_embed_dim,
            cfg.flip_sin_to_cos,
            cfg.freq_shift,
        ).astype(dtype)
        time_ids_emb = time_ids_emb.reshape(text_embeds.shape[0], -1)
        add_emb = jnp.concatenate(
            [text_embeds.astype(dtype), time_ids_emb], axis=-1
        )
        emb = emb + TimestepEmbedding(
            time_embed_dim, dtype=dtype, name="add_embedding"
        )(add_emb)
    return emb


def apply_down_blocks(
    cfg: UNetConfig, dtype, backend, x: jax.Array, emb: jax.Array, context: jax.Array
) -> tuple[jax.Array, list[jax.Array]]:
    """The UNet down path after conv_in; shared with ControlNet."""
    residuals = []
    for level, out_ch in enumerate(cfg.block_out_channels):
        is_last = level == len(cfg.block_out_channels) - 1
        if cfg.down_block_has_attn[level]:
            x, outs = CrossAttnDownBlock2D(
                cfg,
                out_ch,
                level,
                add_downsample=not is_last,
                dtype=dtype,
                backend=backend,
                name=f"down_blocks_{level}",
            )(x, emb, context)
        else:
            x, outs = DownBlock2D(
                cfg,
                out_ch,
                add_downsample=not is_last,
                dtype=dtype,
                name=f"down_blocks_{level}",
            )(x, emb)
        residuals.extend(outs)
    return x, residuals


class UNet2DConditionModel(nn.Module):
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32
    backend: str = "xla"

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, H, W, C) latents, NHWC
        timesteps: jax.Array,  # (B,) or scalar
        encoder_hidden_states: jax.Array,  # (B, S, cross_dim)
        down_block_additional_residuals: Optional[list] = None,
        mid_block_additional_residual: Optional[jax.Array] = None,
        added_cond_kwargs: Optional[dict] = None,
    ) -> jax.Array:
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        context = encoder_hidden_states.astype(self.dtype)
        sample = sample.astype(self.dtype)

        emb = apply_time_embedding(cfg, self.dtype, timesteps, added_cond_kwargs)
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(sample)
        conv_in_out = x
        x, down_residuals = apply_down_blocks(
            cfg, self.dtype, self.backend, x, emb, context
        )
        residuals = [conv_in_out] + down_residuals

        if down_block_additional_residuals is not None:
            residuals = [
                r + c.astype(r.dtype)
                for r, c in zip(residuals, down_block_additional_residuals)
            ]

        x = UNetMidBlock2DCrossAttn(
            cfg,
            cfg.block_out_channels[-1],
            dtype=self.dtype,
            backend=self.backend,
            name="mid_block",
        )(x, emb, context)
        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual.astype(x.dtype)

        n_levels = len(cfg.block_out_channels)
        for i in range(n_levels):
            level = n_levels - 1 - i  # mirror of the down path
            out_ch = cfg.block_out_channels[level]
            is_last = i == n_levels - 1
            if cfg.down_block_has_attn[level]:
                x = CrossAttnUpBlock2D(
                    cfg,
                    out_ch,
                    level,
                    add_upsample=not is_last,
                    dtype=self.dtype,
                    backend=self.backend,
                    name=f"up_blocks_{i}",
                )(x, residuals, emb, context)
            else:
                x = UpBlock2D(
                    cfg,
                    out_ch,
                    add_upsample=not is_last,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )(x, residuals, emb)

        x = group_norm(x.shape[-1], 1e-5, self.dtype, "conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(x)
        return x
