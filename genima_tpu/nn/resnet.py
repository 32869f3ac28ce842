"""ResNet-18 image encoder for the ACT controller, with DETR-style frozen
BatchNorm, sine 2D positional embeddings, and FiLM language conditioning.

Rebuilds RoboBase's ``ImageEncoderACT`` (reference
``controller/cfgs/method/genima_act.yaml:29-39``: resnet18 backbone, sine
position embedding, hidden 256, use_lang_cond) TPU-first in Flax:

* torchvision-compatible ResNet-18 layout (conv1/bn1/layer1..4) so pretrained
  weights port as rename+transpose; BatchNorm is DETR ``FrozenBatchNorm2d``
  — scale/bias/running stats are parameters excluded from optimization (the
  controller trainer masks the ``frozen_bn`` collection-style leaves by name).
* FiLM conditioning on the CLIP language embedding: per-stage (gamma, beta)
  from a zero-init projection, applied after each residual stage — identity
  at init.
* Multi-view handling: the backbone runs vmapped over views; features are
  concatenated along width (the reference note "detr_vae expects views on
  the width channel", ``genima_act.py:195``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics/affine as fixed parameters (DETR)."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale / jnp.sqrt(var + self.eps)
        return x * inv.astype(self.dtype) + (bias - mean * inv).astype(self.dtype)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=self.strides, padding=1, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        y = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="conv2",
        )(y)
        y = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=self.strides, use_bias=False,
                dtype=self.dtype, name="downsample_0",
            )(residual)
            residual = FrozenBatchNorm(
                self.features, dtype=self.dtype, name="downsample_1"
            )(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """torchvision resnet18 trunk (no avgpool/fc), NHWC, optional FiLM."""

    dtype: jnp.dtype = jnp.float32
    width: int = 64  # tests can shrink
    # CIFAR-style stem for small views: 3x3 stride-1 conv1, no maxpool —
    # total downsample 8x instead of 32x, preserving the token density the
    # reference's 256px inputs get from the standard stem (256/32 = 8
    # tokens/side vs e.g. 48/8 = 6). The torchvision stem at <=64px leaves
    # 2x2 feature maps, burying sub-cell target positions.
    small_inputs: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, lang_emb: jax.Array | None = None
    ) -> jax.Array:
        w = self.width
        if self.small_inputs:
            x = nn.Conv(
                w, (3, 3), strides=1, padding=1, use_bias=False,
                dtype=self.dtype, name="conv1",
            )(x)
            x = FrozenBatchNorm(w, dtype=self.dtype, name="bn1")(x)
            x = nn.relu(x)
        else:
            x = nn.Conv(
                w, (7, 7), strides=2, padding=3, use_bias=False,
                dtype=self.dtype, name="conv1",
            )(x)
            x = FrozenBatchNorm(w, dtype=self.dtype, name="bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )
        stage_widths = [w, 2 * w, 4 * w, 8 * w]
        for stage, sw in enumerate(stage_widths):
            strides = 1 if stage == 0 else 2
            x = BasicBlock(sw, strides, dtype=self.dtype, name=f"layer{stage+1}_0")(x)
            x = BasicBlock(sw, 1, dtype=self.dtype, name=f"layer{stage+1}_1")(x)
            if lang_emb is not None:
                # FiLM: zero-init projection => identity at init
                gb = nn.Dense(
                    2 * sw, kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name=f"film{stage+1}",
                )(lang_emb.astype(self.dtype))
                gamma, beta = jnp.split(gb, 2, axis=-1)
                x = x * (1.0 + gamma[:, None, None, :]) + beta[:, None, None, :]
        return x


def sine_position_embedding_2d(
    h: int, w: int, num_pos_feats: int, temperature: float = 10000.0
) -> np.ndarray:
    """DETR PositionEmbeddingSine (normalize=True): (H, W, 2*num_pos_feats)."""
    scale = 2 * np.pi
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, axis=1)
    x_embed = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, axis=0)
    eps = 1e-6
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3)
    pos_x = pos_x.reshape(h, w, -1)
    pos_y = pos_y.reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1)  # (H, W, 2*num_pos_feats)


class ImageEncoderACT(nn.Module):
    """Multi-view ResNet-18 encoder -> (tokens, pos, lang) for the DETR actor.

    Views are concatenated along width before flattening so cross-view
    attention sees all cameras (reference ``genima_act.py:190-199``).
    """

    hidden_dim: int = 256
    use_lang_cond: bool = True
    dtype: jnp.dtype = jnp.float32
    width: int = 64
    small_inputs: bool = False

    @nn.compact
    def __call__(
        self,
        images: jax.Array,  # (B, V, H, W, 3), ImageNet-normalized
        lang_emb: jax.Array | None = None,  # (B, lang_dim)
    ) -> tuple[jax.Array, jax.Array]:
        b, v, h, w, c = images.shape
        backbone = ResNet18(
            dtype=self.dtype, width=self.width,
            small_inputs=self.small_inputs, name="backbone",
        )
        feats = []
        for i in range(v):
            feats.append(
                backbone(
                    images[:, i],
                    lang_emb if self.use_lang_cond else None,
                )
            )
        # (B, h', v*w', C): views side by side on the width axis
        feat = jnp.concatenate(feats, axis=2)
        feat = nn.Conv(
            self.hidden_dim, (1, 1), dtype=self.dtype, name="input_proj"
        )(feat)
        fh, fw = feat.shape[1], feat.shape[2]
        pos = jnp.asarray(
            sine_position_embedding_2d(fh, fw, self.hidden_dim // 2),
            self.dtype,
        )
        tokens = feat.reshape(b, fh * fw, self.hidden_dim)
        pos_tokens = pos.reshape(1, fh * fw, self.hidden_dim)
        return tokens, pos_tokens
