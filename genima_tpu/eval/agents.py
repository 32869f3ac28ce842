"""Diffusion inference agents — the eval-time wrappers around the jitted
pipelines.

Rebuilds the reference's agent hierarchy (``controller/agent/``):
``DiffusionAgent`` lifecycle (load_checkpoint -> set_optimizations ->
common_setup, ``diffusion_agent.py:10-16``) with three concrete agents
(SD-ControlNet / SDXL-ControlNet / Pix2Pix). Checkpoint discovery follows
the reference: the latest ``checkpoint-*/controlnet`` subdir by natural
sort, else the directory itself as a final checkpoint
(``sd_controlnet_agent.py:19-29``).

TPU mapping of the reference's optimization toggles: torch.compile ->
``jax.jit`` (always on — the whole denoise loop is one XLA program);
xformers/fused-qkv -> the attention backend flag (XLA fused or Pallas
flash); fp16 -> bf16; channels-last -> NHWC natively.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from genima_tpu.core import checkpoint as ckpt
from genima_tpu.data.tokenizer import load_tokenizer
from genima_tpu.diffusion.pipeline import (
    SDControlNetPipeline,
    SDPix2PixPipeline,
    SDXLControlNetPipeline,
)


@dataclasses.dataclass(eq=False)
class DiffusionAgent:
    """Base lifecycle shared by the three agents."""

    diffusion_ckpt: str | None = None
    sd_ckpt: str | None = None  # base model weights dir (ported from HF)
    resolution: int = 512
    dtype: Any = jnp.bfloat16
    backend: str = "xla"
    tokenizer_merges: str | None = None
    num_inference_steps: int = 5
    guidance_scale: float = 0.0
    seed: int = 2  # reference eval_genima.yaml diffusion_seed
    autoencoder: str = ""  # 'taesd' for the tiny fast VAE (reference knob)
    pipe: Any = None  # inject a preconfigured pipeline (tests use tiny configs)

    def __post_init__(self):
        if self.pipe is None:
            self.pipe = self._build_pipeline()
        # merges auto-discovered from the base SD snapshot when unset
        self.tokenizer = load_tokenizer(
            self.tokenizer_merges, model_dir=self.sd_ckpt
        )
        self.params = self._load_params()
        self._episode_counter = 0
        self._prompt_cache: dict[tuple, Any] = {}

    # -- to be specialized -------------------------------------------------

    def _build_pipeline(self):
        raise NotImplementedError

    def _model_subdir(self) -> str:
        return "controlnet"

    # -- checkpoint loading ----------------------------------------------------

    def _load_params(self) -> dict:
        """Base weights from sd_ckpt dir + fine-tuned submodel from
        diffusion_ckpt; random init where unavailable (tests)."""
        params = self.pipe.init_params(jax.random.key(0), self.resolution)
        if self.sd_ckpt and Path(self.sd_ckpt).exists():
            base = ckpt.load_pytree(Path(self.sd_ckpt) / "params.msgpack")
            for k, v in base.items():
                if k in params:
                    params[k] = v
        if self.diffusion_ckpt and Path(self.diffusion_ckpt).exists():
            sub = self._model_subdir()
            model_dir = ckpt.find_model_checkpoint(self.diffusion_ckpt, sub)
            params[sub] = ckpt.load_pytree(model_dir / "params.msgpack")
            print(f"Loaded {sub} checkpoint from {model_dir}")
        if self.dtype == jnp.bfloat16:
            # serving storage: bf16 compute casts every f32 param to bf16
            # at use anyway, so pre-casting is numerically identical —
            # and halves weight HBM traffic where XLA fuses the convert
            # into the consumer instead of hoisting it (measured −2.2
            # ms/gen on the flagship loop; PERF.md round 3). Also the only
            # way SDXL's ~16 GB f32 tree fits one v5e.
            params = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16)
                if getattr(v, "dtype", None) == jnp.float32 else v,
                params,
            )
        return params

    # -- episode RNG (reference: fixed torch.Generator(seed) per episode) ------

    def new_episode(self) -> None:
        self._episode_key = jax.random.key(self.seed)
        self._noise_key = jax.random.key(self.seed + 1)

    def _next_latents(self, batch: int) -> jax.Array:
        if not hasattr(self, "_episode_key"):
            self.new_episode()
        self._episode_key, sub = jax.random.split(self._episode_key)
        return self.pipe.init_latents(sub, batch, self.resolution, self.resolution)

    def _next_key(self) -> jax.Array:
        """Fresh subkey from a SEPARATE per-episode noise chain (the
        ancestral-noise input of the fused step; unused by DDIM-style
        pipelines but always threaded so the fused program signature is
        family-independent). Separate so that threading it does not perturb
        the latent stream of pipelines that ignore it."""
        if not hasattr(self, "_noise_key"):
            self._noise_key = jax.random.key(self.seed + 1)
        self._noise_key, sub = jax.random.split(self._noise_key)
        return sub

    def fused_generate(
        self, params, cond, embeds, latents, key,
        num_inference_steps: int = 5, decode_mode: str | None = None,
    ):
        """Device-side generate with a family-independent signature, the
        hook the fused/batched control steps (``eval/fused.py``,
        ``eval/parallel.py``) trace: ``embeds`` is whatever
        ``_embed_prompts`` returned (a pytree), ``key`` feeds pipelines
        with in-loop noise (EulerAncestral) and is ignored otherwise.
        ``decode_mode`` overrides the pipeline's batch-decode policy for
        this traced program (static; the GSPMD-sharded lockstep path
        forces "batched")."""
        raise NotImplementedError

    # -- prompt handling -----------------------------------------------------

    def _embed_prompts(self, prompts: list[str]):
        key = tuple(prompts)
        if key not in self._prompt_cache:
            ids = jnp.asarray(self.tokenizer(list(prompts)))
            self._prompt_cache[key] = self.pipe.encode_prompt(self.params, ids)
        return self._prompt_cache[key]

    # -- inference -------------------------------------------------------------

    def infer(
        self,
        images: np.ndarray,  # (B, H, W, 3) uint8 tiled observations
        prompts: list[str],
        negative_prompts: list[str] | None = None,
        num_inference_steps: int | None = None,
        guidance_scale: float | None = None,
    ) -> np.ndarray:
        raise NotImplementedError


@dataclasses.dataclass(eq=False)
class SDControlNetAgent(DiffusionAgent):
    """SD-turbo + ControlNet (the flagship agent,
    ``controller/agent/sd_controlnet_agent.py``)."""

    def _build_pipeline(self):
        return SDControlNetPipeline(
            dtype=self.dtype, backend=self.backend,
            use_tiny_vae=self.autoencoder == "taesd",
        )

    def infer_device(self, images, prompts, negative_prompts=None,
                     num_inference_steps=None, guidance_scale=None):
        """Like infer() but returns the device array — the closed loop keeps
        generated targets on-device between the diffusion and ACT stages
        (a single host->device transfer per control step)."""
        steps = num_inference_steps or self.num_inference_steps
        guidance = (
            guidance_scale if guidance_scale is not None else self.guidance_scale
        )
        cond = jnp.asarray(images)  # uint8 travels 4x lighter to the device
        if cond.dtype != jnp.uint8:
            cond = cond.astype(jnp.float32) / 255.0
        embeds = self._embed_prompts(prompts)
        neg = None
        if guidance > 1.0 and negative_prompts:
            neg = self._embed_prompts(negative_prompts)
        latents = self._next_latents(cond.shape[0])
        return self.pipe.generate(
            self.params, cond, embeds, latents,
            num_inference_steps=steps,
            guidance_scale=float(guidance),
            negative_prompt_embeds=neg,
        )

    def infer(self, images, prompts, negative_prompts=None,
              num_inference_steps=None, guidance_scale=None):
        return np.asarray(
            self.infer_device(
                images, prompts, negative_prompts, num_inference_steps,
                guidance_scale,
            )
        )

    def fused_generate(self, params, cond, embeds, latents, key,
                       num_inference_steps: int = 5, decode_mode=None):
        # key unused: DDIM/Euler-discrete turbo sampling injects no noise
        return self.pipe.generate(
            params, cond, embeds, latents,
            num_inference_steps=num_inference_steps,
            decode_mode=decode_mode,
        )


@dataclasses.dataclass(eq=False)
class SDXLControlNetAgent(DiffusionAgent):
    """SDXL-turbo + ControlNet (``controller/agent/sdxl_controlnet_agent.py``)."""

    def _build_pipeline(self):
        return SDXLControlNetPipeline(
            dtype=self.dtype, backend=self.backend,
            use_tiny_vae=self.autoencoder == "taesd",
        )

    def infer_device(self, images, prompts, negative_prompts=None,
                     num_inference_steps=None, guidance_scale=None):
        steps = num_inference_steps or self.num_inference_steps
        cond = jnp.asarray(images)
        if cond.dtype != jnp.uint8:
            cond = cond.astype(jnp.float32) / 255.0
        embeds = self._embed_prompts(prompts)
        latents = self._next_latents(cond.shape[0])
        return self.fused_generate(
            self.params, cond, embeds, latents, self._next_key(),
            num_inference_steps=steps,
        )

    def infer(self, images, prompts, negative_prompts=None,
              num_inference_steps=None, guidance_scale=None):
        return np.asarray(
            self.infer_device(
                images, prompts, negative_prompts, num_inference_steps,
                guidance_scale,
            )
        )

    def fused_generate(self, params, cond, embeds, latents, key,
                       num_inference_steps: int = 5, decode_mode=None):
        # embeds = (hidden, pooled); key drives EulerAncestral noise
        hidden, pooled = embeds
        return self.pipe.generate(
            params, cond, hidden, pooled, latents, key,
            num_inference_steps=num_inference_steps,
            decode_mode=decode_mode,
        )


@dataclasses.dataclass(eq=False)
class SDPix2PixAgent(DiffusionAgent):
    """InstructPix2Pix (``controller/agent/sd_pix2pix_agent.py``) — the
    fine-tuned UNet is the submodel; conditioning image in [-1, 1]."""

    def _build_pipeline(self):
        return SDPix2PixPipeline(
            dtype=self.dtype, backend=self.backend,
            use_tiny_vae=self.autoencoder == "taesd",
        )

    def _model_subdir(self) -> str:
        return "unet"

    def infer_device(self, images, prompts, negative_prompts=None,
                     num_inference_steps=None, guidance_scale=None):
        steps = num_inference_steps or self.num_inference_steps
        cond = jnp.asarray(images)
        if cond.dtype != jnp.uint8:
            cond = cond.astype(jnp.float32) / 127.5 - 1.0
        embeds = self._embed_prompts(prompts)
        latents = self._next_latents(cond.shape[0])
        return self.pipe.generate(
            self.params, cond, embeds, latents, num_inference_steps=steps
        )

    def infer(self, images, prompts, negative_prompts=None,
              num_inference_steps=None, guidance_scale=None):
        return np.asarray(
            self.infer_device(
                images, prompts, negative_prompts, num_inference_steps,
                guidance_scale,
            )
        )

    def fused_generate(self, params, cond, embeds, latents, key,
                       num_inference_steps: int = 5, decode_mode=None):
        # key unused: pix2pix turbo sampling injects no in-loop noise
        return self.pipe.generate(
            params, cond, embeds, latents,
            num_inference_steps=num_inference_steps,
            decode_mode=decode_mode,
        )


def make_tiny_sd_agent(resolution: int = 64, **kw) -> SDControlNetAgent:
    """Tiny-config agent for CI/smoke runs (hydra-targetable)."""
    import jax.numpy as jnp

    from genima_tpu.nn.clip_text import CLIPTextConfig
    from genima_tpu.nn.unet import UNetConfig
    from genima_tpu.nn.vae import VAEConfig

    pipe = SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    kw.pop("sd_ckpt", None)
    return SDControlNetAgent(pipe=pipe, resolution=resolution, **kw)


def make_tiny_sdxl_agent(resolution: int = 64, **kw) -> SDXLControlNetAgent:
    """Tiny-config SDXL agent for CI/smoke runs (hydra-targetable)."""
    import jax.numpy as jnp

    from genima_tpu.nn.clip_text import CLIPTextConfig
    from genima_tpu.nn.unet import UNetConfig
    from genima_tpu.nn.vae import VAEConfig

    pipe = SDXLControlNetPipeline(
        unet_cfg=UNetConfig.tiny(
            addition_embed_type="text_time", addition_time_embed_dim=8,
            cross_attention_dim=48,
        ),
        vae_cfg=VAEConfig.tiny_test(scaling_factor=0.13025),
        text_cfg=CLIPTextConfig.tiny(hidden_size=16, num_heads=2),
        text_cfg_2=CLIPTextConfig.tiny(hidden_size=32, projection_dim=16),
        dtype=jnp.float32,
    )
    kw.pop("sd_ckpt", None)
    return SDXLControlNetAgent(pipe=pipe, resolution=resolution, **kw)


def make_tiny_pix2pix_agent(resolution: int = 64, **kw) -> SDPix2PixAgent:
    """Tiny-config InstructPix2Pix agent for CI/smoke runs."""
    import jax.numpy as jnp

    from genima_tpu.nn.clip_text import CLIPTextConfig
    from genima_tpu.nn.unet import UNetConfig
    from genima_tpu.nn.vae import VAEConfig

    pipe = SDPix2PixPipeline(
        unet_cfg=UNetConfig.tiny(in_channels=8),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    kw.pop("sd_ckpt", None)
    return SDPix2PixAgent(pipe=pipe, resolution=resolution, **kw)
