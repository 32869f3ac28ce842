"""The Genima ACT controller agent: encoder + CVAE actor + CLIP language.

Rebuilds the reference's ``GenimaACT(ActBCAgent)`` + ``GenimaACTPolicy``
(``controller/method/genima_act.py:142-422``) as a functional JAX agent:

* ``act``: ONE jitted program — ImageNet normalization, multi-view ResNet-18
  (FiLM on CLIP lang), DETR-VAE inference (zeros latent), returning the
  20-action chunk (``genima_act.py:273-312``).
* ``update``: ONE jitted program — train-time augmentation (elastic /
  colorjitter / crop / noise, ``:150-163``), frozen CLIP text encoding,
  CVAE forward, masked L1 + 0.05*BCE + KL loss, AdamW with split parameter
  groups (backbone at ``lr_backbone``; FrozenBatchNorm statistics excluded,
  ``:251-271``), optional grad clip.

The CLIP text tower is frozen and kept outside the trainable tree — the
checkpoint contract strips ``clip_model`` keys (``train_act.py:262-279``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genima_tpu.core.init_utils import fast_init
from genima_tpu.data.augment import act_train_augment
from genima_tpu.nn.act import ACTConfig, GenimaACTModel, act_loss
from genima_tpu.nn.clip_text import CLIPTextConfig, CLIPTextModel
from genima_tpu.nn.resnet import ImageEncoderACT

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class AgentState(NamedTuple):
    params: Any  # {"encoder": ..., "actor": ...}
    opt_state: Any
    step: jax.Array


def _param_label(path_names: list[str]) -> str:
    """Optimizer group for a parameter path.

    ``frozen``: FrozenBatchNorm stats/affine (DETR semantics);
    ``backbone``: ResNet weights (lr_backbone);
    ``main``: everything else (lr).
    """
    in_backbone = any(n == "backbone" for n in path_names)
    is_bn = any(
        n.startswith("bn") or n == "downsample_1" for n in path_names
    )
    if in_backbone and is_bn:
        return "frozen"
    if in_backbone:
        return "backbone"
    return "main"


@dataclasses.dataclass(eq=False)
class GenimaACTAgent:
    act_cfg: ACTConfig = dataclasses.field(default_factory=ACTConfig)
    clip_cfg: CLIPTextConfig = dataclasses.field(
        default_factory=CLIPTextConfig.vit_b_32
    )
    lr: float = 5e-5
    lr_backbone: float = 1e-5
    weight_decay: float = 1e-4
    actor_grad_clip: float | None = None
    num_views: int = 4
    frame_stack: int = 1
    image_size: int = 256
    data_augmentation: bool = True
    dtype: Any = jnp.float32
    resnet_width: int = 64
    # small-view stem (nn/resnet.py): 8x total downsample instead of 32x,
    # for controllers trained on <=64px views
    resnet_small_inputs: bool = False

    def __post_init__(self):
        # the CLIP text projection feeds FiLM + the task token; keep its
        # width authoritative from act_cfg.lang_dim
        if self.clip_cfg.projection_dim != self.act_cfg.lang_dim:
            self.clip_cfg = dataclasses.replace(
                self.clip_cfg, projection_dim=self.act_cfg.lang_dim
            )
        self.encoder = ImageEncoderACT(
            hidden_dim=self.act_cfg.hidden_dim,
            use_lang_cond=self.act_cfg.use_lang_cond,
            dtype=self.dtype,
            width=self.resnet_width,
            small_inputs=self.resnet_small_inputs,
        )
        self.actor = GenimaACTModel(self.act_cfg, dtype=self.dtype)
        self.clip = CLIPTextModel(self.clip_cfg, dtype=self.dtype)
        self._jit_act = jax.jit(self._act_impl)
        self._jit_update = None
        self._clip_params = None

        def label_tree(params):
            flat, treedef = jax.tree_util.tree_flatten_with_path(params)
            labels = [
                _param_label([str(getattr(p, "key", p)) for p in path])
                for path, _ in flat
            ]
            return jax.tree_util.tree_unflatten(treedef, labels)

        def make_adamw(lr):
            return optax.adamw(lr, weight_decay=self.weight_decay)

        chain = []
        if self.actor_grad_clip:
            chain.append(optax.clip_by_global_norm(self.actor_grad_clip))
        chain.append(
            optax.multi_transform(
                {
                    "main": make_adamw(self.lr),
                    "backbone": make_adamw(self.lr_backbone),
                    "frozen": optax.set_to_zero(),
                },
                label_tree,
            )
        )
        self.tx = optax.chain(*chain)

    # -- initialization -------------------------------------------------------

    def init_params(self, key: jax.Array) -> tuple[dict, dict]:
        """Returns (trainable agent params, frozen clip params)."""
        k1, k2, k3 = jax.random.split(key, 3)
        v = self.num_views * self.frame_stack
        images = jnp.zeros((1, v, self.image_size, self.image_size, 3))
        lang = jnp.zeros((1, self.act_cfg.lang_dim))
        enc_p = fast_init(self.encoder, k1, images, lang, seed=11)["params"]
        tokens, pos = self.encoder.apply({"params": enc_p}, images, lang)
        qpos = jnp.zeros((1, self.act_cfg.state_dim * self.frame_stack))
        actor_p = fast_init(
            self.actor,
            {"params": k2, "dropout": k2},
            tokens,
            pos,
            qpos,
            jnp.zeros((1, self.act_cfg.num_queries, self.act_cfg.action_dim)),
            jnp.zeros((1, self.act_cfg.num_queries), bool),
            lang,
            latent_key=k2,
            train=True,
            seed=12,
        )["params"]
        ids = jnp.zeros((1, 77), jnp.int32)
        clip_p = fast_init(self.clip, k3, ids, seed=13)["params"]
        return {"encoder": enc_p, "actor": actor_p}, clip_p

    def create_state(self, params: dict, clip_params: dict) -> AgentState:
        self._clip_params = clip_params
        return AgentState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    # -- language ----------------------------------------------------------

    def encode_lang(self, clip_params, lang_tokens: jax.Array) -> jax.Array:
        """(B, 77) -> (B, 512) frozen CLIP sentence embedding
        (reference ``encode_clip_text``, projected EOT feature)."""
        out = self.clip.apply({"params": clip_params}, lang_tokens)
        emb = out.text_embeds if out.text_embeds is not None else out.pooled_output
        return jax.lax.stop_gradient(emb.astype(jnp.float32))

    # -- inference ------------------------------------------------------------

    def _act_impl(self, params, clip_params, images, qpos, lang_tokens):
        """images: (B, V, H, W, 3) float [0,255]; qpos: (B, state_dim*fs)."""
        lang = self.encode_lang(clip_params, lang_tokens)
        x = images / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        tokens, pos = self.encoder.apply(
            {"params": params["encoder"]}, x.astype(self.dtype), lang
        )
        out = self.actor.apply(
            {"params": params["actor"]},
            tokens, pos, qpos,
            task_emb=lang,
            train=False,
        )
        return out.actions

    def act(self, params, images, qpos, lang_tokens) -> jax.Array:
        """Jitted: returns the (B, num_queries, action_dim) action chunk."""
        return self._jit_act(params, self._clip_params, images, qpos, lang_tokens)

    # -- training ---------------------------------------------------------

    def _loss(self, params, clip_params, batch, key):
        k_aug, k_latent, k_drop = jax.random.split(key, 3)
        images = batch["images"]  # (B, V, H, W, 3) float [0,255]
        if self.data_augmentation:
            b, v, h, w, c = images.shape
            images = act_train_augment(k_aug, images.reshape(b * v, h, w, c))
            images = images.reshape(b, v, h, w, c)
        x = images / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        lang = self.encode_lang(clip_params, batch["lang_tokens"])
        tokens, pos = self.encoder.apply(
            {"params": params["encoder"]}, x.astype(self.dtype), lang
        )
        out = self.actor.apply(
            {"params": params["actor"]},
            tokens, pos, batch["qpos"],
            actions=batch["actions"],
            is_pad=batch["is_pad"],
            task_emb=lang,
            latent_key=k_latent,
            train=True,
            rngs={"dropout": k_drop},
        )
        return act_loss(
            out, batch["actions"], batch["is_pad"], self.act_cfg.kl_weight
        )

    def _update_impl(self, state: AgentState, clip_params, batch, key):
        (loss, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, clip_params, batch, key
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return AgentState(params, opt_state, state.step + 1), metrics

    def update(self, state: AgentState, batch, key, mesh=None):
        """One jitted BC step (reference ``GenimaACT.update``,
        ``genima_act.py:348-422``). batch keys: images (B,V,H,W,3) [0,255],
        qpos (B,state*fs), actions (B,T,A), is_pad (B,T), lang_tokens (B,77).
        """
        if self._jit_update is None:
            if mesh is not None:
                from genima_tpu.core.mesh import data_sharding, replicated

                rep, data = replicated(mesh), data_sharding(mesh)
                self._jit_update = jax.jit(
                    self._update_impl,
                    in_shardings=(rep, rep, data, rep),
                    out_shardings=(rep, rep),
                    donate_argnums=(0,),
                )
            else:
                self._jit_update = jax.jit(self._update_impl, donate_argnums=(0,))
        return self._jit_update(state, self._clip_params, batch, key)
