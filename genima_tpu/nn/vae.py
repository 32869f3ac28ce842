"""AutoencoderKL (SD VAE) in Flax, NHWC — encode observations to latents,
decode generated latents to target images.

Architecture mirrors diffusers ``AutoencoderKL`` (frozen in the reference's
ControlNet fine-tune, ``diffusion/train_controlnet_genima.py:1324-1332``;
decode at eval inside the pipeline). Also provides ``AutoencoderTiny``
(taesd), the reference's optional fast VAE
(``controller/agent/sd_controlnet_agent.py:44-49``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from genima_tpu.nn.layers import ResnetBlock2D, group_norm


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215

    @staticmethod
    def sd(**kw) -> "VAEConfig":
        return VAEConfig(**kw)

    @staticmethod
    def sdxl(**kw) -> "VAEConfig":
        return VAEConfig(scaling_factor=0.13025, **kw)

    @staticmethod
    def tiny_test(**kw) -> "VAEConfig":
        defaults = dict(block_out_channels=(16, 32), layers_per_block=1)
        defaults.update(kw)
        return VAEConfig(**defaults)


class VAEAttention(nn.Module):
    """Single-head spatial self-attention in the VAE mid block."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        y = group_norm(c, 1e-6, self.dtype, "group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        # fused attention: at 64x64 latents this is a 4096-token single-head
        # attention with 512-dim values — materializing the score matrix
        # spills to HBM and dominates the decode latency
        y = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        y = nn.Dense(c, dtype=self.dtype, name="to_out_0")(y)
        return residual + y.reshape(b, h, w, c)


class VAEMidBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResnetBlock2D(
            self.channels, use_time_emb=False, eps=1e-6, dtype=self.dtype,
            name="resnets_0",
        )(x)
        x = VAEAttention(self.channels, dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(
            self.channels, use_time_emb=False, eps=1e-6, dtype=self.dtype,
            name="resnets_1",
        )(x)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(x)
        for level, out_ch in enumerate(cfg.block_out_channels):
            for i in range(cfg.layers_per_block):
                x = ResnetBlock2D(
                    out_ch, use_time_emb=False, eps=1e-6, dtype=self.dtype,
                    name=f"down_blocks_{level}_resnets_{i}",
                )(x)
            if level < len(cfg.block_out_channels) - 1:
                # diffusers VAE downsample: stride-2 conv with asymmetric
                # (0,1)x(0,1) padding
                x = nn.Conv(
                    out_ch, (3, 3), strides=2, padding=((0, 1), (0, 1)),
                    dtype=self.dtype, name=f"down_blocks_{level}_downsample",
                )(x)
        x = VAEMidBlock(
            cfg.block_out_channels[-1], dtype=self.dtype, name="mid_block"
        )(x)
        x = group_norm(x.shape[-1], 1e-6, self.dtype, "conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype,
            name="conv_out",
        )(x)


class Decoder(nn.Module):
    """SD VAE decoder. ``conv_backend="fused"`` routes the up-block resnets,
    upsample convs, and the conv_out chain through the fused GN-SiLU-conv3x3
    Pallas kernel (kernels/fused_conv.py) with an identical parameter tree
    — the inference-path default on TPU (see SDControlNetPipeline)."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32
    conv_backend: str = "xla"

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.cfg
        fused = self.conv_backend == "fused"
        if fused:
            from genima_tpu.nn.fused_blocks import (
                FusedResnetBlock2D,
                _ConvParams,
                _GNParams,
                fused_gn_silu_conv,
            )

        reversed_channels = list(reversed(cfg.block_out_channels))
        x = nn.Conv(
            reversed_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(z)
        x = VAEMidBlock(reversed_channels[0], dtype=self.dtype, name="mid_block")(x)
        for level, out_ch in enumerate(reversed_channels):
            for i in range(cfg.layers_per_block + 1):
                name = f"up_blocks_{level}_resnets_{i}"
                if fused:
                    x = FusedResnetBlock2D(
                        out_ch, dtype=self.dtype, name=name
                    )(x)
                else:
                    x = ResnetBlock2D(
                        out_ch, use_time_emb=False, eps=1e-6,
                        dtype=self.dtype, name=name,
                    )(x)
            if level < len(reversed_channels) - 1:
                # upsample convs stay on XLA: measured 0.89x through the
                # fused kernel at 512^2 (scripts/bench_fused_conv.py) — the
                # halo reload fraction dominates at the small row bands the
                # VMEM budget allows for these shapes
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
                x = nn.Conv(
                    out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name=f"up_blocks_{level}_upsample",
                )(x)
        if fused:
            gn_p = _GNParams(x.shape[-1], name="conv_norm_out")()
            conv_p = _ConvParams(
                x.shape[-1], cfg.out_channels, name="conv_out"
            )()
            return fused_gn_silu_conv(x.astype(self.dtype), gn_p, conv_p)
        x = group_norm(x.shape[-1], 1e-6, self.dtype, "conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(x)


class LatentDistribution(NamedTuple):
    """Diagonal gaussian over latents (diffusers DiagonalGaussianDistribution)."""

    mean: jax.Array
    logvar: jax.Array

    def sample(self, key: jax.Array) -> jax.Array:
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype
        )

    def mode(self) -> jax.Array:
        return self.mean


class AutoencoderKL(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32
    # "fused": decoder resnets/upsample/conv_out through the Pallas kernel
    # (TPU inference path); "xla" for training/CPU. Parameter trees are
    # identical, so the flag can differ between trainer and pipeline.
    conv_backend: str = "xla"

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(
            self.cfg, dtype=self.dtype, conv_backend=self.conv_backend
        )
        self.quant_conv = nn.Conv(
            2 * self.cfg.latent_channels, (1, 1), dtype=self.dtype,
            name="quant_conv",
        )
        self.post_quant_conv = nn.Conv(
            self.cfg.latent_channels, (1, 1), dtype=self.dtype,
            name="post_quant_conv",
        )

    def encode(self, x: jax.Array) -> LatentDistribution:
        """x: (B, H, W, 3) in [-1, 1] -> distribution over (B, H/8, W/8, 4)."""
        moments = self.quant_conv(self.encoder(x.astype(self.dtype)))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return LatentDistribution(mean, logvar)

    def decode(self, z: jax.Array) -> jax.Array:
        """z: (B, h, w, 4) *unscaled* latents -> (B, H, W, 3) in [-1, 1]."""
        return self.decoder(self.post_quant_conv(z.astype(self.dtype)))

    def __call__(self, x: jax.Array, key: jax.Array) -> jax.Array:
        dist = self.encode(x)
        return self.decode(dist.sample(key))


class _TaesdBlock(nn.Module):
    """taesd residual block: 3x conv-relu with residual add."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv_0")(x)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv_2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv_4")(h)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                        name="skip")(x)
        return nn.relu(h + x)


class AutoencoderTiny(nn.Module):
    """taesd — distilled VAE used as the reference's fast-inference option.

    Deterministic: ``encode`` returns latents directly (``.latents`` in the
    reference at ``train_controlnet_genima.py:1324-1327``), already in the
    scaled-latent space (no extra scaling_factor multiply).
    """

    latent_channels: int = 4
    width: int = 64
    n_levels: int = 3
    blocks_per_level: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self._encoder = _TaesdEncoder(
            self.latent_channels, self.width, self.n_levels,
            self.blocks_per_level, dtype=self.dtype, name="encoder",
        )
        self._decoder = _TaesdDecoder(
            3, self.width, self.n_levels, self.blocks_per_level,
            dtype=self.dtype, name="decoder",
        )

    def __call__(self, x, key=None):
        return self.decode(self.encode(x))

    def encode(self, x: jax.Array) -> jax.Array:
        return self._encoder(x)

    def decode(self, z: jax.Array) -> jax.Array:
        return self._decoder(z)


class _TaesdEncoder(nn.Module):
    out_channels: int
    width: int
    n_levels: int
    blocks_per_level: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        x = _TaesdBlock(self.width, dtype=self.dtype, name="block_in")(x)
        for lvl in range(self.n_levels):
            x = nn.Conv(
                self.width, (3, 3), strides=2, padding=1, use_bias=False,
                dtype=self.dtype, name=f"down_{lvl}",
            )(x)
            for b in range(self.blocks_per_level):
                x = _TaesdBlock(
                    self.width, dtype=self.dtype, name=f"block_{lvl}_{b}"
                )(x)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(x)


class _TaesdDecoder(nn.Module):
    out_channels: int
    width: int
    n_levels: int
    blocks_per_level: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        x = jnp.tanh(z / 3.0) * 3.0  # taesd latent clamp
        x = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        x = nn.relu(x)
        for lvl in range(self.n_levels):
            for b in range(self.blocks_per_level):
                x = _TaesdBlock(
                    self.width, dtype=self.dtype, name=f"block_{lvl}_{b}"
                )(x)
            bsz, h, w, c = x.shape
            x = jax.image.resize(x, (bsz, 2 * h, 2 * w, c), method="nearest")
            x = nn.Conv(
                self.width, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                name=f"up_{lvl}",
            )(x)
        x = _TaesdBlock(self.width, dtype=self.dtype, name="block_out")(x)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(x)
