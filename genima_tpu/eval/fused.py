"""The fully-fused Genima control step: ONE XLA program from tiled
observation to action chunk.

The reference crosses the host<->device boundary 4x per control step
(SURVEY.md §3.3); the device-resident harness path reduced that to one
upload + one action download but still dispatches three programs (generate,
untile, act). This fuses the 5-step ControlNet denoise loop, the VAE decode,
the on-device untile + ImageNet normalization, and the full ACT forward into
a single jitted call — the flagship latency program of the framework.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from genima_tpu.data.tiling import untile_to_cameras


class FusedGenimaStep:
    """generate + untile + act, jitted once.

    Built from any diffusion agent exposing ``fused_generate`` (SD, SDXL,
    Pix2Pix — ``eval.agents``) and a controller agent
    (``control.policy.GenimaACTAgent``).
    """

    def __init__(self, diffusion_agent, controller_agent, obs_size: int = 256):
        self.pipe = diffusion_agent.pipe
        # family-independent generate hook (SD / SDXL / Pix2Pix); plain
        # pipe fallback keeps bench scripts constructible from a bare pipe
        self._gen = getattr(diffusion_agent, "fused_generate", None)
        self.controller = controller_agent
        self.obs_size = obs_size
        self._fn = jax.jit(
            self._step_impl, static_argnames=("num_inference_steps",)
        )

    def _step_impl(
        self,
        diffusion_params,
        controller_params,
        clip_params,
        tiled_u8,  # (fs, 2S, 2S, 3) uint8
        prompt_embeds,  # pytree: (fs, 77, hidden) [+ pooled for SDXL]
        latents,  # (fs, h, w, 4)
        qpos,  # (1, state_dim*fs)
        lang_tokens,  # (1, 77)
        key=None,  # ancestral-noise key (SDXL); ignored by SD/Pix2Pix
        num_inference_steps: int = 5,
    ):
        if self._gen is not None:
            target = self._gen(
                diffusion_params, tiled_u8, prompt_embeds, latents, key,
                num_inference_steps=num_inference_steps,
            )
        else:
            target = self.pipe.generate(
                diffusion_params, tiled_u8, prompt_embeds, latents,
                num_inference_steps=num_inference_steps,
            )  # (fs, 2S, 2S, 3) uint8
        cams = untile_to_cameras(
            target.astype(jnp.float32), target_size=self.obs_size
        )  # (fs, 4, S, S, 3) in [0, 255]
        act_images = jnp.transpose(cams, (1, 0, 2, 3, 4)).reshape(
            1, -1, self.obs_size, self.obs_size, 3
        )
        actions = self.controller._act_impl(
            controller_params, clip_params, act_images, qpos, lang_tokens
        )
        return actions, target

    def __call__(
        self,
        diffusion_params,
        controller_params,
        clip_params,
        tiled_u8,
        prompt_embeds,
        latents,
        qpos,
        lang_tokens,
        key=None,
        num_inference_steps: int = 5,
    ):
        return self._fn(
            diffusion_params, controller_params, clip_params, tiled_u8,
            prompt_embeds, latents, qpos, lang_tokens, key,
            num_inference_steps=num_inference_steps,
        )
