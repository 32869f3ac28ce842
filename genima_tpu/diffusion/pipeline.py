"""Jitted diffusion inference pipelines.

The reference runs diffusers ``StableDiffusionControlNetPipeline`` (and the
SDXL / InstructPix2Pix variants) per control step, with torch.compile as the
speed knob (``controller/agent/sd_controlnet_agent.py:31-61``). Here the
*entire* sampling program — prompt encoding excluded (it is per-episode
constant in the Genima loop), latents init, the N-step
ControlNet+UNet denoise loop via ``lax.fori_loop``, the VAE decode, and the
[-1,1]->uint8 postprocess — is ONE jitted XLA program: a single host->device
transfer in (tiled observation), a single transfer out (target image). This
is the north-star latency path (<100 ms p50 closed-loop step on v5e-4,
BASELINE.md).

Classifier-free guidance: Genima evaluates at ``guidance_scale: 0.0``
(``controller/cfgs/eval_genima.yaml``), and like diffusers the pipeline
skips the negative branch entirely when guidance <= 1 — half the FLOPs.
CFG > 1 is supported via batch doubling for parity.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from genima_tpu.data.tiling import denormalize_to_uint8
from genima_tpu.diffusion.schedulers import (
    EulerAncestralScheduler,
    EulerDiscreteScheduler,
    split_maybe_batched,
)
from genima_tpu.nn.clip_text import CLIPTextConfig, CLIPTextModel
from genima_tpu.nn.controlnet import ControlNetModel
from genima_tpu.nn.unet import UNet2DConditionModel, UNetConfig
from genima_tpu.nn.vae import AutoencoderKL, VAEConfig


@dataclasses.dataclass(eq=False)
class SDControlNetPipeline:
    """SD-turbo + ControlNet sampling (the flagship Genima diffusion agent).

    Parameters live in a dict with keys ``unet``, ``controlnet``, ``vae``,
    ``text_encoder`` — each a flax params tree.
    """

    unet_cfg: UNetConfig = dataclasses.field(default_factory=UNetConfig.sd21)
    vae_cfg: VAEConfig = dataclasses.field(default_factory=VAEConfig.sd)
    text_cfg: CLIPTextConfig = dataclasses.field(default_factory=CLIPTextConfig.sd21)
    scheduler: Any = dataclasses.field(default_factory=EulerDiscreteScheduler)
    dtype: Any = jnp.bfloat16
    # packed flash attention (kernels/packed_attention.py): -4.3 ms/denoise
    # step vs "xla" on v5e, numerically parity-tested. "xla" remains the
    # no-Pallas fallback. Append "+w8" ("fused+w8") for int8 weight-only
    # transformer matmuls (kernels/w8_matmul.py) — requires params run
    # through weights/quantize.py::quantize_pipeline_params.
    backend: str = "fused"
    # VAE decoder conv backend. "xla" measured FASTER end-to-end than the
    # fused GN-SiLU-conv3x3 Pallas kernel ("fused", kernels/fused_conv.py):
    # isolated convs win up to 1.9x, but composed decoders lose to the
    # stats pass + layout conversions at every custom-call boundary
    # (PERF.md round-2 continuation; scripts/ab_fused_decode.py: 18.4 ms
    # xla vs 41.6 ms fused).
    conv_backend: str = "xla"
    # the reference's taesd fast-VAE knob (sd_controlnet_agent.py:44-49):
    # decode generated latents with the distilled AutoencoderTiny
    use_tiny_vae: bool = False
    # How to decode a BATCH of latents. XLA's TPU conv lowering for the
    # 512x512 narrow-channel decoder degrades ~2.5x per image at batch
    # 2..7 (measured scripts/ab_batch_scaling.py on v5e: 17.8 ms/img at
    # N=1, 45.5 at N=2, 48.9 at N=4, then 16.2 at N=8 once the batch
    # fills the 8-sublane tile). "auto" decodes per-image via lax.map in
    # that bad window and natively otherwise; "batched" forces the native
    # path (REQUIRED when the batch axis is GSPMD-sharded over a mesh —
    # a global lax.map would serialize across devices); "single" forces
    # per-image decode. Callers that need a different mode for ONE traced
    # program pass ``decode_mode=...`` to ``generate`` (a static argument,
    # so it participates in the jit cache key) instead of mutating this
    # field — mutation would NOT invalidate already-traced programs
    # (``self`` hashes by identity).
    decode_mode: str = "auto"
    # The "auto" bad window, half-open [lo, hi): a v5e measurement of the
    # 512x512 FULL-VAE decode (scripts/ab_batch_scaling.py). Other TPU
    # generations / resolutions may have a different (or no) bad window —
    # re-measure with that script and override here rather than trusting
    # the default. "auto" never applies to the taesd tiny-VAE path (its
    # wide-channel convs were not part of the measurement; force
    # decode_mode="single" explicitly if a tiny-VAE window is measured).
    decode_single_window: tuple = (2, 8)

    def __post_init__(self):
        self.unet = UNet2DConditionModel(self.unet_cfg, dtype=self.dtype,
                                         backend=self.backend)
        # conditioning embedding must downsample image-res -> latent-res:
        # one stride-2 stage per VAE downsample (3 for SD's 8x)
        n_stages = len(self.vae_cfg.block_out_channels)
        self.controlnet = ControlNetModel(
            self.unet_cfg,
            conditioning_scale_channels=(16, 32, 96, 256)[:n_stages],
            dtype=self.dtype,
            backend=self.backend,
        )
        self.vae = AutoencoderKL(
            self.vae_cfg, dtype=self.dtype, conv_backend=self.conv_backend
        )
        if self.use_tiny_vae:
            from genima_tpu.nn.vae import AutoencoderTiny

            self.tiny_vae = AutoencoderTiny(
                dtype=self.dtype,
                n_levels=len(self.vae_cfg.block_out_channels) - 1,
            )
        self.text_encoder = CLIPTextModel(self.text_cfg, dtype=self.dtype)
        self._encode_prompt = jax.jit(self._encode_prompt_impl)

    def _decode_latents(
        self, params: dict, sample: jax.Array, mode: Optional[str] = None
    ) -> jax.Array:
        """Scaled latents -> image in [-1, 1]; taesd consumes scaled latents
        directly (diffusers AutoencoderTiny convention).

        Batch handling per ``mode`` (defaults to ``self.decode_mode``): in
        the measured bad window (``decode_single_window``, default batch
        2..7) the per-image sequential decode is ~2.5x faster per image
        than the native batched lowering on v5e."""
        n = sample.shape[0]
        mode = self.decode_mode if mode is None else mode
        lo, hi = self.decode_single_window
        single = mode == "single" or (
            mode == "auto" and not self.use_tiny_vae and lo <= n < hi
        )
        if single:
            return jax.lax.map(
                lambda s: self._decode_one_batch(params, s[None])[0], sample
            )
        return self._decode_one_batch(params, sample)

    def _decode_one_batch(self, params: dict, sample: jax.Array) -> jax.Array:
        if self.use_tiny_vae:
            return self.tiny_vae.apply(
                {"params": params["tiny_vae"]}, sample.astype(self.dtype),
                method=self.tiny_vae.decode,
            ).astype(jnp.float32)
        return self.vae.apply(
            {"params": params["vae"]},
            (sample / self.vae_cfg.scaling_factor).astype(self.dtype),
            method=self.vae.decode,
        ).astype(jnp.float32)

    # -- prompt encoding (per-episode constant in the Genima closed loop) ----

    def _encode_prompt_impl(self, params, input_ids):
        out = self.text_encoder.apply({"params": params["text_encoder"]}, input_ids)
        return out.last_hidden_state

    def encode_prompt(self, params, input_ids: jax.Array) -> jax.Array:
        """(B, 77) int32 token ids -> (B, 77, hidden) embeddings."""
        return self._encode_prompt(params, input_ids)

    # -- sampling ------------------------------------------------------------

    @property
    def vae_scale_factor(self) -> int:
        """Spatial downsampling of the VAE (8 for SD: 3 stride-2 stages)."""
        return 2 ** (len(self.vae_cfg.block_out_channels) - 1)

    def init_latents(
        self, key: jax.Array, batch: int, height: int, width: int
    ) -> jax.Array:
        """Standard-normal latents; scaled by init_noise_sigma inside
        ``generate`` (diffusers convention)."""
        f = self.vae_scale_factor
        return jax.random.normal(
            key, (batch, height // f, width // f, self.vae_cfg.latent_channels),
            jnp.float32,
        )

    @partial(
        jax.jit,
        static_argnames=(
            "self", "num_inference_steps", "return_uint8", "guidance_scale",
            "controlnet_conditioning_scale", "decode_mode",
        ),
    )
    def generate(
        self,
        params: dict,
        cond_image: jax.Array,  # (B, H, W, 3) float in [0, 1]
        prompt_embeds: jax.Array,  # (B, 77, hidden)
        latents: jax.Array,  # (B, H/8, W/8, 4) standard normal
        num_inference_steps: int = 5,
        guidance_scale: float = 0.0,
        negative_prompt_embeds: Optional[jax.Array] = None,
        controlnet_conditioning_scale: float = 1.0,
        return_uint8: bool = True,
        decode_mode: Optional[str] = None,  # override self.decode_mode (static)
    ) -> jax.Array:
        """Full denoise loop + VAE decode as one XLA program.

        Returns (B, H, W, 3) uint8 target images (reference pipeline output
        convention) or [-1,1] float when ``return_uint8=False``.
        """
        state = self.scheduler.set_timesteps(num_inference_steps)
        do_cfg = guidance_scale > 1.0 and negative_prompt_embeds is not None

        # accept uint8 observations: the host->device transfer then moves 1
        # byte/px instead of 4 (the closed-loop h2d is on the latency path)
        if cond_image.dtype == jnp.uint8:
            cond_image = cond_image.astype(self.dtype) / 255.0
        cond = cond_image.astype(self.dtype)
        embeds = prompt_embeds.astype(self.dtype)
        if do_cfg:
            embeds = jnp.concatenate(
                [negative_prompt_embeds.astype(self.dtype), embeds], axis=0
            )

        # the conditioning-embedding CNN is loop-invariant: hoist it out of
        # the denoise body (at 10-step non-unrolled sampling recomputing it
        # per step costs ~11 ms/generation)
        from genima_tpu.nn.controlnet import embed_conditioning

        cond_emb = embed_conditioning(
            self.unet_cfg, self.controlnet.conditioning_scale_channels,
            self.dtype, params["controlnet"], cond,
        )
        if do_cfg:
            cond_emb = jnp.concatenate([cond_emb, cond_emb], axis=0)

        sample = latents * state.init_noise_sigma

        def body(i, sample):
            t = state.timesteps[i]
            model_in = self.scheduler.scale_model_input(state, sample, i)
            if do_cfg:
                model_in = jnp.concatenate([model_in, model_in], axis=0)
            model_in = model_in.astype(self.dtype)
            tt = jnp.broadcast_to(t, (model_in.shape[0],))
            down_res, mid_res = self.controlnet.apply(
                {"params": params["controlnet"]},
                model_in,
                tt,
                embeds,
                cond_emb,
                conditioning_scale=controlnet_conditioning_scale,
                cond_is_embedded=True,
            )
            eps = self.unet.apply(
                {"params": params["unet"]},
                model_in,
                tt,
                embeds,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid_res,
            )
            if do_cfg:
                eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
                eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
            return self.scheduler.step(state, eps.astype(jnp.float32), i, sample)

        # turbo step counts are small: full unroll lets XLA fuse across
        # steps (~4% at 5 steps on v5e; at 10 steps unrolling measured
        # level with the rolled loop and tripled compile time, so roll)
        sample = jax.lax.fori_loop(
            0, num_inference_steps, body, sample.astype(jnp.float32),
            unroll=num_inference_steps <= 8,
        )

        image = self._decode_latents(params, sample, decode_mode)
        if return_uint8:
            return denormalize_to_uint8(image)
        return image

    # -- initialization helpers ----------------------------------------------

    def init_params(
        self, key: jax.Array, image_size: int = 512, fast: bool = True
    ) -> dict:
        """Random-init all four models (tests / benches / from-scratch).

        ``fast=True`` uses structural numpy init (the real flow ports
        pretrained SD-turbo weights anyway); ControlNet zero convs and the
        conditioning-embedding conv_out stay zero either way, preserving the
        from_unet identity property.
        """
        from genima_tpu.core.init_utils import fast_init

        k1, k2, k3, k4 = jax.random.split(key, 4)
        h = image_size // self.vae_scale_factor
        lat = jnp.zeros((1, h, h, self.unet_cfg.in_channels))
        t = jnp.zeros((1,))
        ctx = jnp.zeros((1, 77, self.text_cfg.hidden_size))
        cond = jnp.zeros((1, image_size, image_size, 3))
        ids = jnp.zeros((1, 77), jnp.int32)
        tiny_p = None
        if self.use_tiny_vae:
            tiny_p = fast_init(self.tiny_vae, k3, cond, seed=7)["params"]
        if fast:
            unet_p = fast_init(self.unet, k1, lat, t, ctx, seed=1)["params"]
            cn_p = fast_init(self.controlnet, k2, lat, t, ctx, cond, seed=2)["params"]
            cn_p["controlnet_cond_embedding"]["conv_out"] = jax.tree_util.tree_map(
                jnp.zeros_like, cn_p["controlnet_cond_embedding"]["conv_out"]
            )
            out = {
                "unet": unet_p,
                "controlnet": cn_p,
                "vae": fast_init(self.vae, k3, cond, k4, seed=3)["params"],
                "text_encoder": fast_init(self.text_encoder, k4, ids, seed=4)["params"],
            }
            if tiny_p is not None:
                out["tiny_vae"] = tiny_p
            return out
        out = {
            "unet": self.unet.init(k1, lat, t, ctx)["params"],
            "controlnet": self.controlnet.init(k2, lat, t, ctx, cond)["params"],
            "vae": self.vae.init(k3, cond, k4)["params"],
            "text_encoder": self.text_encoder.init(k4, ids)["params"],
        }
        if tiny_p is not None:
            out["tiny_vae"] = tiny_p
        return out


@dataclasses.dataclass(eq=False)
class SDXLControlNetPipeline(SDControlNetPipeline):
    """SDXL-turbo + ControlNet variant (dual text encoders, text_time
    micro-conditioning; reference ``train_controlnet_sdxl_genima.py``)."""

    unet_cfg: UNetConfig = dataclasses.field(default_factory=UNetConfig.sdxl)
    vae_cfg: VAEConfig = dataclasses.field(default_factory=VAEConfig.sdxl)
    text_cfg: CLIPTextConfig = dataclasses.field(
        default_factory=CLIPTextConfig.sdxl_one
    )
    text_cfg_2: CLIPTextConfig = dataclasses.field(
        default_factory=CLIPTextConfig.sdxl_two
    )
    scheduler: Any = dataclasses.field(default_factory=EulerAncestralScheduler)

    def __post_init__(self):
        super().__post_init__()
        self.text_encoder_2 = CLIPTextModel(self.text_cfg_2, dtype=self.dtype)
        self._encode_prompt = jax.jit(self._encode_prompt_impl)

    def _encode_prompt_impl(self, params, input_ids):
        """SDXL prompt encoding: concat penultimate hidden states of both
        encoders; pooled embeds from encoder 2
        (reference ``train_controlnet_sdxl_genima.py:854-893``)."""
        out1 = self.text_encoder.apply({"params": params["text_encoder"]}, input_ids)
        out2 = self.text_encoder_2.apply(
            {"params": params["text_encoder_2"]}, input_ids
        )
        embeds = jnp.concatenate(
            [out1.penultimate_hidden_state, out2.penultimate_hidden_state], axis=-1
        )
        return embeds, out2.text_embeds

    def encode_prompt(self, params, input_ids):
        return self._encode_prompt(params, input_ids)

    @staticmethod
    def make_time_ids(batch: int, size: int = 512) -> jax.Array:
        """SDXL add_time_ids: (orig_h, orig_w, crop_top, crop_left, tgt_h,
        tgt_w) (reference ``:1232-1261``)."""
        return jnp.tile(
            jnp.array([[size, size, 0, 0, size, size]], jnp.float32), (batch, 1)
        )

    @partial(
        jax.jit,
        static_argnames=(
            "self", "num_inference_steps", "return_uint8", "decode_mode",
        ),
    )
    def generate(
        self,
        params: dict,
        cond_image: jax.Array,
        prompt_embeds: jax.Array,
        pooled_embeds: jax.Array,
        latents: jax.Array,
        key: jax.Array,
        num_inference_steps: int = 5,
        controlnet_conditioning_scale: float = 1.0,
        return_uint8: bool = True,
        decode_mode: Optional[str] = None,
    ) -> jax.Array:
        """Turbo sampling (no CFG) with EulerAncestral noise injection."""
        state = self.scheduler.set_timesteps(num_inference_steps)
        if cond_image.dtype == jnp.uint8:
            cond_image = cond_image.astype(self.dtype) / 255.0
        cond = cond_image.astype(self.dtype)
        embeds = prompt_embeds.astype(self.dtype)
        added = {
            "text_embeds": pooled_embeds.astype(self.dtype),
            "time_ids": self.make_time_ids(cond.shape[0], cond.shape[1]),
        }
        from genima_tpu.nn.controlnet import embed_conditioning

        cond_emb = embed_conditioning(
            self.unet_cfg, self.controlnet.conditioning_scale_channels,
            self.dtype, params["controlnet"], cond,
        )
        sample = latents * state.init_noise_sigma

        def body(i, carry):
            sample, key = carry
            t = state.timesteps[i]
            model_in = self.scheduler.scale_model_input(state, sample, i).astype(
                self.dtype
            )
            tt = jnp.broadcast_to(t, (model_in.shape[0],))
            down_res, mid_res = self.controlnet.apply(
                {"params": params["controlnet"]},
                model_in, tt, embeds, cond_emb,
                conditioning_scale=controlnet_conditioning_scale,
                added_cond_kwargs=added,
                cond_is_embedded=True,
            )
            eps = self.unet.apply(
                {"params": params["unet"]},
                model_in, tt, embeds,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid_res,
                added_cond_kwargs=added,
            )
            # a (N,) key batch keeps one noise chain per lockstep episode
            # (schedulers.split_maybe_batched); a scalar key is the serial
            # single-episode chain — identical math either way
            key, sub = split_maybe_batched(key)
            sample = self.scheduler.step(
                state, eps.astype(jnp.float32), i, sample, sub
            )
            return sample, key

        sample, _ = jax.lax.fori_loop(
            0, num_inference_steps, body, (sample.astype(jnp.float32), key),
            unroll=num_inference_steps <= 8,
        )
        image = self._decode_latents(params, sample, decode_mode)
        if return_uint8:
            return denormalize_to_uint8(image)
        return image

    def init_params(self, key: jax.Array, image_size: int = 512) -> dict:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        h = image_size // self.vae_scale_factor
        lat = jnp.zeros((1, h, h, self.unet_cfg.in_channels))
        t = jnp.zeros((1,))
        ctx = jnp.zeros(
            (1, 77, self.text_cfg.hidden_size + self.text_cfg_2.hidden_size)
        )
        cond = jnp.zeros((1, image_size, image_size, 3))
        ids = jnp.zeros((1, 77), jnp.int32)
        added = {
            "text_embeds": jnp.zeros((1, self.text_cfg_2.projection_dim)),
            "time_ids": self.make_time_ids(1, image_size),
        }
        return {
            "unet": self.unet.init(k1, lat, t, ctx, added_cond_kwargs=added)["params"],
            "controlnet": self.controlnet.init(
                k2, lat, t, ctx, cond, added_cond_kwargs=added
            )["params"],
            "vae": self.vae.init(k3, cond, k4)["params"],
            "text_encoder": self.text_encoder.init(k4, ids)["params"],
            "text_encoder_2": self.text_encoder_2.init(k5, ids)["params"],
        }


@dataclasses.dataclass(eq=False)
class SDPix2PixPipeline(SDControlNetPipeline):
    """InstructPix2Pix: fine-tuned 8-channel UNet, conditioning image
    VAE-encoded (mode) and channel-concatenated with the noisy latents
    (reference ``train_instruct_pix2pix_genima.py:1196-1236``)."""

    unet_cfg: UNetConfig = dataclasses.field(default_factory=UNetConfig.pix2pix)

    def __post_init__(self):
        self.unet = UNet2DConditionModel(self.unet_cfg, dtype=self.dtype,
                                         backend=self.backend)
        self.vae = AutoencoderKL(self.vae_cfg, dtype=self.dtype)
        if self.use_tiny_vae:
            from genima_tpu.nn.vae import AutoencoderTiny

            self.tiny_vae = AutoencoderTiny(
                dtype=self.dtype,
                n_levels=len(self.vae_cfg.block_out_channels) - 1,
            )
        self.text_encoder = CLIPTextModel(self.text_cfg, dtype=self.dtype)
        self._encode_prompt = jax.jit(self._encode_prompt_impl)

    @partial(
        jax.jit,
        static_argnames=(
            "self", "num_inference_steps", "return_uint8", "decode_mode",
        ),
    )
    def generate(
        self,
        params: dict,
        cond_image: jax.Array,  # (B, H, W, 3) float in [-1, 1] for pix2pix
        prompt_embeds: jax.Array,
        latents: jax.Array,
        num_inference_steps: int = 5,
        return_uint8: bool = True,
        decode_mode: Optional[str] = None,
    ) -> jax.Array:
        state = self.scheduler.set_timesteps(num_inference_steps)
        if cond_image.dtype == jnp.uint8:
            cond_image = cond_image.astype(self.dtype) / 127.5 - 1.0
        embeds = prompt_embeds.astype(self.dtype)
        # conditioning latents via VAE mode (no sampling), no scaling_factor
        # (diffusers pix2pix convention: prepare_image_latents uses .mode())
        image_latents = self.vae.apply(
            {"params": params["vae"]}, cond_image.astype(self.dtype),
            method=self.vae.encode,
        ).mode().astype(jnp.float32)

        sample = latents * state.init_noise_sigma

        def body(i, sample):
            t = state.timesteps[i]
            model_in = self.scheduler.scale_model_input(state, sample, i)
            model_in = jnp.concatenate(
                [model_in.astype(self.dtype), image_latents.astype(self.dtype)],
                axis=-1,
            )
            tt = jnp.broadcast_to(t, (model_in.shape[0],))
            eps = self.unet.apply({"params": params["unet"]}, model_in, tt, embeds)
            return self.scheduler.step(state, eps.astype(jnp.float32), i, sample)

        sample = jax.lax.fori_loop(
            0, num_inference_steps, body, sample.astype(jnp.float32),
            unroll=num_inference_steps <= 8,
        )
        image = self._decode_latents(params, sample, decode_mode)
        if return_uint8:
            return denormalize_to_uint8(image)
        return image

    def init_params(self, key: jax.Array, image_size: int = 512) -> dict:
        k1, k3, k4 = jax.random.split(key, 3)
        h = image_size // self.vae_scale_factor
        lat = jnp.zeros((1, h, h, self.unet_cfg.in_channels))
        t = jnp.zeros((1,))
        ctx = jnp.zeros((1, 77, self.text_cfg.hidden_size))
        cond = jnp.zeros((1, image_size, image_size, 3))
        ids = jnp.zeros((1, 77), jnp.int32)
        return {
            "unet": self.unet.init(k1, lat, t, ctx)["params"],
            "vae": self.vae.init(k3, cond, k4)["params"],
            "text_encoder": self.text_encoder.init(k4, ids)["params"],
        }
