"""ControlNet in Flax — the trainable model of the Genima diffusion stage.

Mirrors the architecture of diffusers ``ControlNetModel`` (the reference
initializes it ``from_unet`` and trains only it,
``diffusion/train_controlnet_genima.py:1066-1071,1107-1110``): a copy of the
UNet's down path + mid block, a conditioning-image embedding CNN, and
zero-initialized 1x1 projections whose outputs are added to the frozen
UNet's skip connections. ``controlnet_params_from_unet`` reproduces the
``from_unet`` initialization by copying the matching parameter subtrees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from genima_tpu.nn.unet import (
    UNetConfig,
    UNetMidBlock2DCrossAttn,
    apply_down_blocks,
    apply_time_embedding,
)


class ControlNetConditioningEmbedding(nn.Module):
    """Maps the full-res conditioning image (NHWC, [0,1]) to latent res.

    diffusers layout: conv_in 3->16, pairs of (conv, stride-2 conv) through
    (16,32,96), zero-init conv_out to block_out_channels[0].
    """

    conditioning_embedding_channels: int
    block_out_channels: tuple = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, conditioning: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(conditioning)
        x = nn.silu(x)
        for i in range(len(self.block_out_channels) - 1):
            x = nn.Conv(
                self.block_out_channels[i], (3, 3), padding=1, dtype=self.dtype,
                name=f"blocks_{2 * i}",
            )(x)
            x = nn.silu(x)
            x = nn.Conv(
                self.block_out_channels[i + 1], (3, 3), strides=2, padding=1,
                dtype=self.dtype, name=f"blocks_{2 * i + 1}",
            )(x)
            x = nn.silu(x)
        return nn.Conv(
            self.conditioning_embedding_channels,
            (3, 3),
            padding=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv_out",
        )(x)


class ControlNetModel(nn.Module):
    cfg: UNetConfig
    conditioning_scale_channels: tuple = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32
    backend: str = "xla"

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, h, w, 4) noisy latents NHWC
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        controlnet_cond: jax.Array,  # (B, H, W, 3) in [0, 1]
        conditioning_scale: float = 1.0,
        added_cond_kwargs: dict | None = None,
        cond_is_embedded: bool = False,
    ) -> tuple[list[jax.Array], jax.Array]:
        """``cond_is_embedded=True``: ``controlnet_cond`` is the precomputed
        (B, h, w, C0) conditioning embedding (see ``embed_conditioning``) —
        the denoise loop hoists the embedding CNN out of the per-step body
        (it is loop-invariant; at 10-step sampling recomputing it costs
        ~11 ms/generation)."""
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        context = encoder_hidden_states.astype(self.dtype)
        sample = sample.astype(self.dtype)

        # reuse the UNet's time-embedding/down-path builders so the parameter
        # trees align for from_unet initialization
        emb = apply_time_embedding(cfg, self.dtype, timesteps, added_cond_kwargs)

        if cond_is_embedded:
            cond_emb = controlnet_cond.astype(self.dtype)
        else:
            cond_emb = ControlNetConditioningEmbedding(
                cfg.block_out_channels[0],
                self.conditioning_scale_channels,
                dtype=self.dtype,
                name="controlnet_cond_embedding",
            )(controlnet_cond.astype(self.dtype))

        # conv_in then add conditioning embedding (diffusers order)
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(sample)
        x = x + cond_emb

        conv_in_out = x
        x, down_residuals = apply_down_blocks(
            cfg, self.dtype, self.backend, x, emb, context
        )
        residuals = [conv_in_out] + down_residuals

        x = UNetMidBlock2DCrossAttn(
            cfg,
            cfg.block_out_channels[-1],
            dtype=self.dtype,
            backend=self.backend,
            name="mid_block",
        )(x, emb, context)

        # zero-initialized output projections
        down_block_res = []
        for i, r in enumerate(residuals):
            proj = nn.Conv(
                r.shape[-1],
                (1, 1),
                dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name=f"controlnet_down_blocks_{i}",
            )(r)
            down_block_res.append(proj * conditioning_scale)
        mid_res = nn.Conv(
            x.shape[-1],
            (1, 1),
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="controlnet_mid_block",
        )(x)
        return down_block_res, mid_res * conditioning_scale


def embed_conditioning(
    cfg: UNetConfig,
    scale_channels: tuple,
    dtype,
    params: dict,
    cond: jax.Array,
) -> jax.Array:
    """Apply just the conditioning-embedding CNN (for hoisting it out of
    the denoise loop; pair with ``cond_is_embedded=True``)."""
    m = ControlNetConditioningEmbedding(
        cfg.block_out_channels[0], scale_channels, dtype=dtype
    )
    return m.apply(
        {"params": params["controlnet_cond_embedding"]}, cond.astype(dtype)
    )


# parameter subtrees ControlNet shares with the UNet (from_unet semantics,
# diffusers ControlNetModel.from_unet: copies conv_in, time_embedding,
# [add_embedding], down_blocks, mid_block; leaves zero convs + cond embedding
# at their fresh init)
_SHARED_PREFIXES = (
    "conv_in",
    "time_embedding",
    "add_embedding",
    "down_blocks_",
    "mid_block",
)


def controlnet_params_from_unet(unet_params: dict, controlnet_params: dict) -> dict:
    """Initialize ControlNet params from a UNet's (reference ``from_unet``).

    Copies every top-level subtree the two models share; keeps the
    ControlNet-only subtrees (cond embedding, zero convs) from
    ``controlnet_params``.
    """
    out = dict(controlnet_params)
    for key in controlnet_params:
        if any(
            key == p or (p.endswith("_") and key.startswith(p))
            for p in _SHARED_PREFIXES
        ):
            if key in unet_params:
                out[key] = unet_params[key]
    return out
