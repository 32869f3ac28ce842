"""DETR-style CVAE transformer for action chunking (ACT) in Flax.

Rebuilds the actor stack behind the reference's ``GenimaMVTransformer``
(``controller/method/genima_act.py:27-139``, extending RoboBase's
``MultiViewTransformerEncoderDecoderACT``):

* a *style-variable encoder* compressing (actions, qpos) to a latent
  (mu, logvar) through a CLS token (CVAE posterior; zeros latent at
  inference),
* a DETR encoder-decoder: the encoder attends over [latent, proprio(,
  task)] tokens + image feature tokens; the decoder cross-attends
  ``num_queries`` (=action_sequence=20) learned queries into the memory,
* heads: ``action_head`` (8-dim: 7 joints + gripper logit) and
  ``is_pad_head``,
* Genima's 2-layer dropout(0.3) proprio projection replacing the stock
  linear (``genima_act.py:236-241``),
* loss = masked L1 on joints + 0.05 * BCE on the gripper logit +
  kl_weight * KL (``genima_act.py:94-139``).

Language conditioning: the CLIP sentence embedding enters as an extra
encoder token with its own learned position embedding (RoboBase's
``use_lang_cond``; the image encoder additionally FiLMs on it).

Config: hidden 256, 4 enc / 6 dec layers, ff 2048, heads 8, dropout 0.1,
post-norm (``pre_norm: false``), latent dim 32, kl_weight 10 —
``controller/cfgs/method/genima_act.yaml:13-27`` + ACT defaults.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ACTConfig:
    hidden_dim: int = 256
    enc_layers: int = 4
    dec_layers: int = 6
    dim_feedforward: int = 2048
    nheads: int = 8
    dropout: float = 0.1
    num_queries: int = 20
    state_dim: int = 8
    action_dim: int = 8
    latent_dim: int = 32
    kl_weight: float = 10.0
    use_lang_cond: bool = True
    lang_dim: int = 512  # CLIP ViT-B/32 projection dim

    @staticmethod
    def tiny(**kw) -> "ACTConfig":
        defaults = dict(
            hidden_dim=32, enc_layers=1, dec_layers=1, dim_feedforward=64,
            nheads=2, num_queries=4, latent_dim=8, lang_dim=16,
        )
        defaults.update(kw)
        return ACTConfig(**defaults)


def sinusoid_table(n: int, dim: int) -> np.ndarray:
    """1D sinusoidal position table (ACT's get_sinusoid_encoding_table)."""
    pos = np.arange(n)[:, None]
    i = np.arange(dim)[None, :]
    angle = pos / np.power(10000.0, 2 * (i // 2) / dim)
    table = np.zeros((n, dim), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class MHA(nn.Module):
    """Multi-head attention with DETR's pos-added-to-qk convention."""

    dim: int
    heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, deterministic: bool = True):
        d = self.dim // self.heads
        b = q_in.shape[0]

        def proj(name, x):
            return nn.Dense(self.dim, dtype=self.dtype, name=name)(x)

        q = proj("q_proj", q_in).reshape(b, -1, self.heads, d)
        k = proj("k_proj", k_in).reshape(b, -1, self.heads, d)
        v = proj("v_proj", v_in).reshape(b, -1, self.heads, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d).astype(q.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, -1, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """DETR post-norm encoder layer (pre_norm=false in the Genima config)."""

    cfg: ACTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        c = self.cfg
        qk = x + pos
        attn = MHA(c.hidden_dim, c.nheads, c.dropout, self.dtype, name="self_attn")(
            qk, qk, x, deterministic
        )
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            x + nn.Dropout(c.dropout, deterministic=deterministic)(attn)
        )
        h = nn.Dense(c.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        h = nn.Dropout(c.dropout, deterministic=deterministic)(nn.relu(h))
        h = nn.Dense(c.hidden_dim, dtype=self.dtype, name="linear2")(h)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(
            x + nn.Dropout(c.dropout, deterministic=deterministic)(h)
        )


class DecoderLayer(nn.Module):
    cfg: ACTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos, mem_pos, deterministic: bool = True):
        c = self.cfg
        qk = tgt + query_pos
        sa = MHA(c.hidden_dim, c.nheads, c.dropout, self.dtype, name="self_attn")(
            qk, qk, tgt, deterministic
        )
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            tgt + nn.Dropout(c.dropout, deterministic=deterministic)(sa)
        )
        ca = MHA(c.hidden_dim, c.nheads, c.dropout, self.dtype, name="cross_attn")(
            tgt + query_pos, memory + mem_pos, memory, deterministic
        )
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            tgt + nn.Dropout(c.dropout, deterministic=deterministic)(ca)
        )
        h = nn.Dense(c.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        h = nn.Dropout(c.dropout, deterministic=deterministic)(nn.relu(h))
        h = nn.Dense(c.hidden_dim, dtype=self.dtype, name="linear2")(h)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(
            tgt + nn.Dropout(c.dropout, deterministic=deterministic)(h)
        )


class ACTOutput(NamedTuple):
    actions: jax.Array  # (B, num_queries, action_dim)
    is_pad_logits: jax.Array  # (B, num_queries)
    mu: Optional[jax.Array]
    logvar: Optional[jax.Array]


class GenimaACTModel(nn.Module):
    """The full CVAE actor (style encoder + DETR transformer + heads)."""

    cfg: ACTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_tokens: jax.Array,  # (B, S, hidden) from ImageEncoderACT
        image_pos: jax.Array,  # (1, S, hidden)
        qpos: jax.Array,  # (B, state_dim)
        actions: Optional[jax.Array] = None,  # (B, T>=num_queries, action_dim)
        is_pad: Optional[jax.Array] = None,  # (B, T) bool
        task_emb: Optional[jax.Array] = None,  # (B, lang_dim)
        latent_key: Optional[jax.Array] = None,
        train: bool = False,
    ) -> ACTOutput:
        c = self.cfg
        b = qpos.shape[0]

        # Genima's proprio projection: linear-dropout(0.3)-linear
        p = nn.Dense(c.hidden_dim, dtype=self.dtype, name="proprio_proj_0")(
            qpos.astype(self.dtype)
        )
        p = nn.Dropout(0.3, deterministic=not train)(p)
        proprio_input = nn.Dense(
            c.hidden_dim, dtype=self.dtype, name="proprio_proj_2"
        )(p)

        # ---- CVAE style encoder (training only) -----------------------------
        if train and actions is not None:
            actions_in = actions[:, : c.num_queries].astype(self.dtype)
            a_tok = nn.Dense(
                c.hidden_dim, dtype=self.dtype, name="encoder_action_proj"
            )(actions_in)
            q_tok = nn.Dense(
                c.hidden_dim, dtype=self.dtype, name="encoder_joint_proj"
            )(qpos.astype(self.dtype))[:, None]
            cls = self.param(
                "cls_embed", nn.initializers.normal(0.02), (1, 1, c.hidden_dim)
            )
            cls_tok = jnp.broadcast_to(cls, (b, 1, c.hidden_dim)).astype(self.dtype)
            seq = jnp.concatenate([cls_tok, q_tok, a_tok], axis=1)
            pos_table = jnp.asarray(
                sinusoid_table(seq.shape[1], c.hidden_dim), self.dtype
            )[None]
            h = seq
            for i in range(c.enc_layers):
                h = EncoderLayer(c, self.dtype, name=f"style_encoder_{i}")(
                    h, pos_table, deterministic=not train
                )
            latent_info = nn.Dense(
                2 * c.latent_dim, dtype=self.dtype, name="latent_proj"
            )(h[:, 0])
            mu = latent_info[:, : c.latent_dim].astype(jnp.float32)
            logvar = latent_info[:, c.latent_dim :].astype(jnp.float32)
            assert latent_key is not None, "training needs a latent sampling key"
            std = jnp.exp(0.5 * logvar)
            latent_sample = mu + std * jax.random.normal(latent_key, mu.shape)
        else:
            mu = logvar = None
            latent_sample = jnp.zeros((b, c.latent_dim), jnp.float32)
        latent_input = nn.Dense(
            c.hidden_dim, dtype=self.dtype, name="latent_out_proj"
        )(latent_sample.astype(self.dtype))

        # ---- DETR encoder over [latent, proprio(, task)] + image tokens -----
        extra = [latent_input[:, None], proprio_input[:, None]]
        n_extra = 2
        if c.use_lang_cond and task_emb is not None:
            t_tok = nn.Dense(c.hidden_dim, dtype=self.dtype, name="task_proj")(
                task_emb.astype(self.dtype)
            )
            extra.append(t_tok[:, None])
            n_extra = 3
        additional_pos = self.param(
            "additional_pos_embed",
            nn.initializers.normal(0.02),
            (n_extra, c.hidden_dim),
        )
        memory = jnp.concatenate(extra + [image_tokens.astype(self.dtype)], axis=1)
        mem_pos = jnp.concatenate(
            [
                jnp.broadcast_to(
                    additional_pos[None], (1, n_extra, c.hidden_dim)
                ).astype(self.dtype),
                image_pos.astype(self.dtype),
            ],
            axis=1,
        )
        for i in range(c.enc_layers):
            memory = EncoderLayer(c, self.dtype, name=f"encoder_{i}")(
                memory, mem_pos, deterministic=not train
            )

        # ---- DETR decoder with learned queries -------------------------------
        query_embed = self.param(
            "query_embed", nn.initializers.normal(0.02),
            (c.num_queries, c.hidden_dim),
        )
        query_pos = jnp.broadcast_to(
            query_embed[None], (b, c.num_queries, c.hidden_dim)
        ).astype(self.dtype)
        tgt = jnp.zeros_like(query_pos)
        for i in range(c.dec_layers):
            tgt = DecoderLayer(c, self.dtype, name=f"decoder_{i}")(
                tgt, memory, query_pos, mem_pos, deterministic=not train
            )
        tgt = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")(tgt)

        a_hat = nn.Dense(c.action_dim, dtype=self.dtype, name="action_head")(tgt)
        is_pad_hat = nn.Dense(1, dtype=self.dtype, name="is_pad_head")(tgt)[..., 0]
        return ACTOutput(
            a_hat.astype(jnp.float32), is_pad_hat.astype(jnp.float32), mu, logvar
        )


def act_loss(
    out: ACTOutput,
    actions: jax.Array,  # (B, T, action_dim)
    is_pad: jax.Array,  # (B, T) bool
    kl_weight: float,
) -> tuple[jax.Array, dict]:
    """Masked L1 + 0.05*BCE(gripper) + kl_weight*KL
    (reference ``genima_act.py:94-139``)."""
    nq = out.actions.shape[1]
    actions = actions[:, :nq]
    is_pad = is_pad[:, :nq]
    not_pad = (~is_pad)[..., None].astype(jnp.float32)

    all_l1 = jnp.abs(actions[..., :-1] - out.actions[..., :-1])
    l1 = jnp.mean(all_l1 * not_pad)

    logits = out.actions[..., -1]
    labels = actions[..., -1]
    bce = optax_sigmoid_bce(logits, labels) * 0.05
    gripper_loss = jnp.mean(bce * not_pad[..., 0])

    # total KL summed over latent dims, averaged over batch (ACT kl_divergence)
    klds = -0.5 * (1 + out.logvar - out.mu**2 - jnp.exp(out.logvar))
    total_kld = jnp.mean(jnp.sum(klds, axis=-1))

    loss = l1 + gripper_loss + total_kld * kl_weight
    return loss, {
        "l1": l1,
        "gripper_loss": gripper_loss,
        "kl": total_kld,
        "loss": loss,
    }


def optax_sigmoid_bce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """binary_cross_entropy_with_logits, numerically stable."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
