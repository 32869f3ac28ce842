"""Diffusion noise schedulers as pure JAX math.

The reference trains with diffusers DDPM/DDIM/EulerDiscrete
(``diffusion/train_controlnet_genima.py:1030-1040``) and samples with the
checkpoint's shipped scheduler (SD-turbo: EulerDiscrete with trailing
spacing; SDXL-turbo: EulerAncestral). Released Genima checkpoints degrade
unless the timestep-spacing/sigma conventions match diffusers exactly
(SURVEY.md §7 "sampler parity"), so the math below mirrors the diffusers
semantics closed-form while being fully jit-able: ``set_timesteps`` runs on
host (static shapes), the per-step functions take precomputed sigma/alpha
tables and a traced step index, so the whole denoise loop compiles into one
XLA program via ``lax.fori_loop`` — no host sync per step.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Stable-Diffusion defaults (v1/v2/turbo share these)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # or "linear"
    prediction_type: str = "epsilon"  # or "v_prediction"
    timestep_spacing: str = "leading"  # "leading" | "trailing" | "linspace"
    steps_offset: int = 1
    set_alpha_to_one: bool = False  # DDIM: SD uses final_alpha = acp[0]


def make_alphas_cumprod(config: SchedulerConfig) -> np.ndarray:
    if config.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                config.beta_start**0.5,
                config.beta_end**0.5,
                config.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    elif config.beta_schedule == "linear":
        betas = np.linspace(
            config.beta_start, config.beta_end, config.num_train_timesteps,
            dtype=np.float64,
        )
    else:
        raise ValueError(f"Unknown beta_schedule {config.beta_schedule}")
    alphas = 1.0 - betas
    return np.cumprod(alphas).astype(np.float32)


def add_noise(
    alphas_cumprod: jax.Array, sample: jax.Array, noise: jax.Array, timesteps: jax.Array
) -> jax.Array:
    """Forward diffusion q(x_t | x_0); timesteps is (B,) int."""
    acp = alphas_cumprod[timesteps].astype(sample.dtype)
    acp = acp.reshape(acp.shape + (1,) * (sample.ndim - acp.ndim))
    return jnp.sqrt(acp) * sample + jnp.sqrt(1.0 - acp) * noise


def get_velocity(
    alphas_cumprod: jax.Array, sample: jax.Array, noise: jax.Array, timesteps: jax.Array
) -> jax.Array:
    """v-prediction target (Salimans & Ho)."""
    acp = alphas_cumprod[timesteps].astype(sample.dtype)
    acp = acp.reshape(acp.shape + (1,) * (sample.ndim - acp.ndim))
    return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * sample


def _spaced_timesteps(config: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Inference timesteps, descending, per diffusers spacing conventions."""
    n_train, n = config.num_train_timesteps, num_inference_steps
    if config.timestep_spacing == "linspace":
        ts = np.linspace(0, n_train - 1, n, dtype=np.float64)[::-1]
    elif config.timestep_spacing == "leading":
        step_ratio = n_train // n
        ts = (np.arange(0, n) * step_ratio).round()[::-1].astype(np.float64)
        ts += config.steps_offset
    elif config.timestep_spacing == "trailing":
        step_ratio = n_train / n
        ts = np.arange(n_train, 0, -step_ratio).round().astype(np.float64) - 1
    else:
        raise ValueError(f"Unknown timestep_spacing {config.timestep_spacing}")
    return ts.copy()


def _pred_original(
    sample: jax.Array, model_output: jax.Array, sigma: jax.Array, prediction_type: str
) -> jax.Array:
    """x0 estimate in sigma-space (karras convention used by Euler)."""
    if prediction_type == "epsilon":
        return sample - sigma * model_output
    if prediction_type == "v_prediction":
        return model_output * (-sigma / jnp.sqrt(sigma**2 + 1)) + sample / (
            sigma**2 + 1
        )
    raise ValueError(f"Unknown prediction_type {prediction_type}")


# ---------------------------------------------------------------------------
# Euler discrete (SD-turbo's sampler; timestep_spacing="trailing")
# ---------------------------------------------------------------------------


class EulerState(NamedTuple):
    timesteps: jax.Array  # (n,) float32, value passed to the UNet
    sigmas: jax.Array  # (n+1,) float32 with trailing 0.0
    init_noise_sigma: jax.Array  # scalar
    num_steps: int


@dataclasses.dataclass(frozen=True)
class EulerDiscreteScheduler:
    config: SchedulerConfig = SchedulerConfig(timestep_spacing="trailing")

    def set_timesteps(self, num_inference_steps: int) -> EulerState:
        acp = make_alphas_cumprod(self.config).astype(np.float64)
        sigmas_full = np.sqrt((1 - acp) / acp)
        ts = _spaced_timesteps(self.config, num_inference_steps)
        sigmas = np.interp(ts, np.arange(len(sigmas_full)), sigmas_full)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        max_sigma = sigmas.max()
        if self.config.timestep_spacing in ("linspace", "trailing"):
            init_noise_sigma = max_sigma
        else:
            init_noise_sigma = float(np.sqrt(max_sigma**2 + 1))
        return EulerState(
            timesteps=jnp.asarray(ts, jnp.float32),
            sigmas=jnp.asarray(sigmas),
            init_noise_sigma=jnp.float32(init_noise_sigma),
            num_steps=num_inference_steps,
        )

    def scale_model_input(self, state: EulerState, sample: jax.Array, i) -> jax.Array:
        sigma = state.sigmas[i].astype(sample.dtype)
        return sample / jnp.sqrt(sigma**2 + 1)

    def step(
        self, state: EulerState, model_output: jax.Array, i, sample: jax.Array
    ) -> jax.Array:
        """One Euler step; i is the (traced) step index into the tables.

        Computed in f32 regardless of model dtype — sigma ratios overflow
        bf16's precision visibly at turbo step counts.
        """
        sigma = state.sigmas[i].astype(jnp.float32)
        sigma_next = state.sigmas[i + 1].astype(jnp.float32)
        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)
        pred_x0 = _pred_original(sample32, out32, sigma, self.config.prediction_type)
        derivative = (sample32 - pred_x0) / sigma
        prev = sample32 + derivative * (sigma_next - sigma)
        return prev.astype(sample.dtype)


# ---------------------------------------------------------------------------
# Euler ancestral (SDXL-turbo's sampler)
# ---------------------------------------------------------------------------


def split_maybe_batched(key: jax.Array) -> tuple[jax.Array, jax.Array]:
    """``jax.random.split`` for a scalar key, or lane-wise for a (N,) key
    batch — one independent noise chain per lockstep episode, so a batched
    episode's in-loop noise is reproducible regardless of cohort
    composition (it equals the serial run with that slot's key)."""
    if key.ndim == 0:
        nxt, sub = jax.random.split(key)
        return nxt, sub
    ks = jax.vmap(jax.random.split)(key)  # (N, 2)
    return ks[:, 0], ks[:, 1]


def _normal_maybe_batched(key: jax.Array, shape, dtype=jnp.float32):
    """Per-slot noise: a (N,) key batch draws each slot's block from its
    own key over the per-slot shape, exactly what the serial (batch =
    one episode) path draws with a scalar key."""
    if key.ndim == 0:
        return jax.random.normal(key, shape, dtype)
    n = key.shape[0]
    assert shape[0] % n == 0, (
        f"batched noise keys ({n}) must divide the sample batch ({shape[0]})"
    )
    per = shape[0] // n
    return jax.vmap(
        lambda k: jax.random.normal(k, (per, *shape[1:]), dtype)
    )(key).reshape(shape)


@dataclasses.dataclass(frozen=True)
class EulerAncestralScheduler:
    config: SchedulerConfig = SchedulerConfig(timestep_spacing="trailing")

    def set_timesteps(self, num_inference_steps: int) -> EulerState:
        return EulerDiscreteScheduler(self.config).set_timesteps(num_inference_steps)

    def scale_model_input(self, state: EulerState, sample: jax.Array, i) -> jax.Array:
        sigma = state.sigmas[i].astype(sample.dtype)
        return sample / jnp.sqrt(sigma**2 + 1)

    def step(
        self,
        state: EulerState,
        model_output: jax.Array,
        i,
        sample: jax.Array,
        key: jax.Array,
    ) -> jax.Array:
        sigma_from = state.sigmas[i].astype(jnp.float32)
        sigma_to = state.sigmas[i + 1].astype(jnp.float32)
        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)
        pred_x0 = _pred_original(
            sample32, out32, sigma_from, self.config.prediction_type
        )
        sigma_up = jnp.sqrt(
            jnp.maximum(
                sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2, 0.0
            )
        )
        sigma_down = jnp.sqrt(jnp.maximum(sigma_to**2 - sigma_up**2, 0.0))
        derivative = (sample32 - pred_x0) / sigma_from
        prev = sample32 + derivative * (sigma_down - sigma_from)
        noise = _normal_maybe_batched(key, sample.shape, jnp.float32)
        prev = prev + noise * sigma_up
        return prev.astype(sample.dtype)


# ---------------------------------------------------------------------------
# DDIM
# ---------------------------------------------------------------------------


class DDIMState(NamedTuple):
    timesteps: jax.Array  # (n,) int32
    alphas_cumprod: jax.Array  # (num_train,) float32
    final_alpha_cumprod: jax.Array  # scalar
    num_steps: int
    step_ratio: int


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    config: SchedulerConfig = SchedulerConfig()

    def set_timesteps(self, num_inference_steps: int) -> DDIMState:
        acp = make_alphas_cumprod(self.config)
        ts = _spaced_timesteps(self.config, num_inference_steps).astype(np.int64)
        final_acp = 1.0 if self.config.set_alpha_to_one else float(acp[0])
        return DDIMState(
            timesteps=jnp.asarray(ts, jnp.int32),
            alphas_cumprod=jnp.asarray(acp),
            final_alpha_cumprod=jnp.float32(final_acp),
            num_steps=num_inference_steps,
            step_ratio=self.config.num_train_timesteps // num_inference_steps,
        )

    def scale_model_input(self, state: DDIMState, sample: jax.Array, i) -> jax.Array:
        return sample

    def step(
        self, state: DDIMState, model_output: jax.Array, i, sample: jax.Array
    ) -> jax.Array:
        """Deterministic DDIM step (eta=0)."""
        t = state.timesteps[i]
        prev_t = t - state.step_ratio
        a_t = state.alphas_cumprod[t]
        a_prev = jnp.where(
            prev_t >= 0,
            state.alphas_cumprod[jnp.maximum(prev_t, 0)],
            state.final_alpha_cumprod,
        )
        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            pred_x0 = (sample32 - jnp.sqrt(1 - a_t) * out32) / jnp.sqrt(a_t)
            eps = out32
        elif self.config.prediction_type == "v_prediction":
            pred_x0 = jnp.sqrt(a_t) * sample32 - jnp.sqrt(1 - a_t) * out32
            eps = jnp.sqrt(a_t) * out32 + jnp.sqrt(1 - a_t) * sample32
        else:
            raise ValueError(self.config.prediction_type)
        prev = jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1 - a_prev) * eps
        return prev.astype(sample.dtype)


# ---------------------------------------------------------------------------
# DDPM (training-noise scheduler; also a sampler)
# ---------------------------------------------------------------------------


class DDPMState(NamedTuple):
    timesteps: jax.Array  # (n,) int32
    alphas_cumprod: jax.Array
    betas: jax.Array
    num_steps: int
    step_ratio: int


@dataclasses.dataclass(frozen=True)
class DDPMScheduler:
    config: SchedulerConfig = SchedulerConfig()

    @property
    def alphas_cumprod(self) -> jax.Array:
        return jnp.asarray(make_alphas_cumprod(self.config))

    def set_timesteps(self, num_inference_steps: int) -> DDPMState:
        acp = make_alphas_cumprod(self.config)
        alphas = np.empty_like(acp)
        alphas[0] = acp[0]
        alphas[1:] = acp[1:] / acp[:-1]
        betas = 1.0 - alphas
        ts = _spaced_timesteps(
            dataclasses.replace(self.config, steps_offset=0), num_inference_steps
        ).astype(np.int64)
        return DDPMState(
            timesteps=jnp.asarray(ts, jnp.int32),
            alphas_cumprod=jnp.asarray(acp),
            betas=jnp.asarray(betas.astype(np.float32)),
            num_steps=num_inference_steps,
            step_ratio=self.config.num_train_timesteps // num_inference_steps,
        )

    def scale_model_input(self, state: DDPMState, sample: jax.Array, i) -> jax.Array:
        return sample

    def step(
        self,
        state: DDPMState,
        model_output: jax.Array,
        i,
        sample: jax.Array,
        key: jax.Array,
    ) -> jax.Array:
        """Ancestral DDPM step with fixed_small variance."""
        t = state.timesteps[i]
        prev_t = t - state.step_ratio
        a_t = state.alphas_cumprod[t]
        a_prev = jnp.where(
            prev_t >= 0, state.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0
        )
        beta_t = 1 - a_t / a_prev
        alpha_t = a_t / a_prev
        sample32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            pred_x0 = (sample32 - jnp.sqrt(1 - a_t) * out32) / jnp.sqrt(a_t)
        elif self.config.prediction_type == "v_prediction":
            pred_x0 = jnp.sqrt(a_t) * sample32 - jnp.sqrt(1 - a_t) * out32
        else:
            raise ValueError(self.config.prediction_type)
        # posterior mean coefficients
        coef_x0 = jnp.sqrt(a_prev) * beta_t / (1 - a_t)
        coef_xt = jnp.sqrt(alpha_t) * (1 - a_prev) / (1 - a_t)
        mean = coef_x0 * pred_x0 + coef_xt * sample32
        var = jnp.clip(beta_t * (1 - a_prev) / (1 - a_t), 1e-20)
        noise = jax.random.normal(key, sample.shape, jnp.float32)
        prev = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
        return prev.astype(sample.dtype)


def make_scheduler(name: str, config: SchedulerConfig | None = None):
    """Factory matching the reference's train_scheduler choices
    (``train_controlnet_genima.py:1030-1040``)."""
    config = config or SchedulerConfig(
        timestep_spacing="trailing" if "euler" in name else "leading"
    )
    if name == "ddpm":
        return DDPMScheduler(config)
    if name == "ddim":
        return DDIMScheduler(config)
    if name == "euler_discrete":
        return EulerDiscreteScheduler(config)
    if name == "euler_ancestral":
        return EulerAncestralScheduler(config)
    raise ValueError(f"Scheduler {name} not supported")
