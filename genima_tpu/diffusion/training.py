"""ControlNet fine-tune training — the TPU equivalent of the reference's
Accelerate/DDP trainer (``diffusion/train_controlnet_genima.py:1317-1480``).

One jitted train step contains the whole reference hot loop: VAE-encode the
target image, add scheduler noise at random timesteps, CLIP-encode the
prompt, ControlNet forward -> residuals, frozen UNet epsilon prediction, MSE
loss, gradients w.r.t. the ControlNet only, global-norm clip (1.0), AdamW
with LR schedule. Data parallelism is a ``NamedSharding`` on the batch over
the mesh's ``data`` axis with replicated parameters — XLA inserts the
gradient all-reduce over ICI (the reference's NCCL DDP equivalent,
SURVEY.md §2.3).

Frozen models (UNet, VAE, text encoder) are donated into the step as
arguments so they stay resident on device across steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from genima_tpu.core.mesh import data_sharding, replicated
from genima_tpu.diffusion.schedulers import (
    SchedulerConfig,
    add_noise,
    get_velocity,
    make_alphas_cumprod,
)

TURBO_TIMESTEPS = (999, 749, 499, 249, 0)  # reference :1339-1354 (ADD paper)


def sample_train_timesteps(cfg: "TrainConfig", k_t: jax.Array, bsz: int):
    """Batch of training timesteps per the config's policy: an explicit
    ``train_timestep_grid`` (highest precedence — align training with the
    serving sampler's exact grid), ``turbo_timesteps`` (sd-turbo's ADD
    grid, reference :1339-1354), else uniform over [0, num_train)."""
    if cfg.train_timestep_grid:
        grid = jnp.asarray(cfg.train_timestep_grid, jnp.int32)
        idx = jax.random.randint(k_t, (bsz,), 0, len(cfg.train_timestep_grid))
        return grid[idx]
    if cfg.timestep_spacing == "turbo_timesteps":
        idx = jax.random.randint(k_t, (bsz,), 0, len(TURBO_TIMESTEPS))
        return jnp.asarray(TURBO_TIMESTEPS, jnp.int32)[idx]
    return jax.random.randint(
        k_t, (bsz,), 0, cfg.scheduler_config.num_train_timesteps
    )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    scale_lr: bool = False  # reference --scale_lr: lr *= batch * n_dev
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    # bitsandbytes --use_8bit_adam equivalent: blockwise int8 moments
    # (core/optim.py), ~4x smaller optimizer state in HBM
    use_8bit_adam: bool = False
    max_grad_norm: float = 1.0
    # reference --gradient_checkpointing (train_controlnet_genima.py arg):
    # rematerialize the ControlNet+UNet region in backward instead of
    # saving its activations — trades one extra forward for the activation
    # memory that otherwise bounds batch size at 512^2
    gradient_checkpointing: bool = False
    lr_scheduler: str = "constant"  # constant|constant_with_warmup|linear|cosine
    lr_warmup_steps: int = 500
    max_train_steps: int = 15000
    gradient_accumulation_steps: int = 1
    timestep_spacing: str = "uniform"  # or "turbo_timesteps"
    # explicit training-timestep grid (e.g. the exact few-step inference
    # grid of the serving sampler). The reference trains against sd-turbo,
    # whose UNet was distilled onto TURBO_TIMESTEPS; a from-scratch base
    # model (diffusion/pretrain.py) has no such prior, so training on the
    # inference grid is what makes few-step sampling coherent. Overrides
    # timestep_spacing when set.
    train_timestep_grid: tuple[int, ...] | None = None
    lr_num_cycles: int = 1  # cosine_with_restarts hard restarts
    lr_power: float = 1.0  # polynomial decay exponent
    lr_end: float = 1e-7  # polynomial floor (diffusers default)
    # bf16 first moment: halves mu HBM traffic (nu stays f32 — second
    # moments need the range). Measured knob, default off for bit-parity
    # with the reference's f32 AdamW.
    adam_mu_bf16: bool = False
    # the grad-norm metric costs an extra reduction over 1.4 GB of grads
    # when XLA fails to CSE it with the clip's norm; optional
    log_grad_norm: bool = True
    proportion_empty_prompts: float = 0.0
    # comma list applied inside the jitted step (reference augment_data,
    # train_controlnet_genima.py:775-830): colorjitter,elastic,blur,affine,crop
    augmentations: str | None = None
    scheduler_config: SchedulerConfig = SchedulerConfig()


class TrainState(NamedTuple):
    params: Any  # trainable (controlnet) params
    opt_state: Any
    step: jax.Array
    # EMA of the trainable params (pix2pix ``--use_ema``); None otherwise.
    # Living in the state keeps the decay update inside the jitted step and
    # the EMA checkpointed/resumable.
    ema: Any = None


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Mirrors diffusers get_scheduler for the choices the reference exposes."""
    base = cfg.learning_rate
    if cfg.lr_scheduler == "constant":
        return optax.constant_schedule(base)
    if cfg.lr_scheduler == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, cfg.lr_warmup_steps),
             optax.constant_schedule(base)],
            [cfg.lr_warmup_steps],
        )
    if cfg.lr_scheduler == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, cfg.lr_warmup_steps),
             optax.linear_schedule(
                 base, 0.0, max(cfg.max_train_steps - cfg.lr_warmup_steps, 1)
             )],
            [cfg.lr_warmup_steps],
        )
    if cfg.lr_scheduler == "cosine":
        # decay_steps must exceed warmup (optax rejects <=0 decay); tiny
        # smoke configs legitimately set max_train_steps < lr_warmup_steps
        warmup = min(cfg.lr_warmup_steps, max(cfg.max_train_steps - 1, 0))
        return optax.warmup_cosine_decay_schedule(
            0.0, base, warmup, max(cfg.max_train_steps, warmup + 1)
        )
    warmup = cfg.lr_warmup_steps
    decay_steps = max(cfg.max_train_steps - warmup, 1)
    if cfg.lr_scheduler == "cosine_with_restarts":
        # diffusers get_cosine_with_hard_restarts_schedule_with_warmup:
        # factor = 0.5*(1+cos(pi*((num_cycles*progress) mod 1))), 0 past end
        cycles = max(int(cfg.lr_num_cycles), 1)

        def restarts(step):
            # join_schedules hands this branch the step already offset by
            # the warmup boundary
            progress = jnp.clip(step / decay_steps, 0.0, None)
            factor = 0.5 * (
                1.0 + jnp.cos(jnp.pi * jnp.mod(cycles * progress, 1.0))
            )
            return base * jnp.where(progress >= 1.0, 0.0, factor)

        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warmup), restarts], [warmup]
        )
    if cfg.lr_scheduler == "polynomial":
        # diffusers get_polynomial_decay_schedule_with_warmup:
        # (lr - lr_end) * (1 - progress)^power + lr_end, lr_end past end
        lr_end, power = cfg.lr_end, cfg.lr_power

        def poly(step):
            progress = jnp.clip(step / decay_steps, 0.0, 1.0)  # offset step
            return (base - lr_end) * (1.0 - progress) ** power + lr_end

        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warmup), poly], [warmup]
        )
    raise ValueError(f"Unknown lr_scheduler {cfg.lr_scheduler}")


def normalize_image_batch(pixel_values, cond_values):
    """Dtype-dispatched batch normalization, on device.

    uint8 batches (loader ``emit_uint8``) ship 4x less host->device data;
    the [-1,1] / [0,1] conventions (reference ``train_controlnet_genima.py``
    :917-942) are applied here where bandwidth is free. f32 batches pass
    through untouched (already normalized on host).
    """
    if pixel_values.dtype == jnp.uint8:
        pixel_values = pixel_values.astype(jnp.float32) / 127.5 - 1.0
    if cond_values.dtype == jnp.uint8:
        cond_values = cond_values.astype(jnp.float32) / 255.0
    return pixel_values, cond_values


class ControlNetTrainer:
    def __init__(self, pipe, cfg: TrainConfig, mesh=None):
        self.pipe = pipe
        self.cfg = cfg
        self.mesh = mesh
        self.alphas_cumprod = jnp.asarray(make_alphas_cumprod(cfg.scheduler_config))
        if cfg.use_8bit_adam:
            from genima_tpu.core.optim import adamw_8bit

            adam = adamw_8bit(
                learning_rate=make_lr_schedule(cfg),
                b1=cfg.adam_beta1,
                b2=cfg.adam_beta2,
                eps=cfg.adam_epsilon,
                weight_decay=cfg.adam_weight_decay,
            )
        else:
            adam = optax.adamw(
                learning_rate=make_lr_schedule(cfg),
                b1=cfg.adam_beta1,
                b2=cfg.adam_beta2,
                eps=cfg.adam_epsilon,
                weight_decay=cfg.adam_weight_decay,
                mu_dtype=jnp.bfloat16 if cfg.adam_mu_bf16 else None,
            )
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), adam)
        if cfg.gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
        self.tx = tx
        self._frozen: Optional[dict] = None
        self._jit_step = None

    def create_state(self, params: dict) -> TrainState:
        """Split params: ControlNet trains, everything else is frozen
        (reference freezes vae/unet/text_encoder at :1107-1109)."""
        self._frozen = {
            k: v for k, v in params.items() if k != "controlnet"
        }
        # copy: from_unet init aliases UNet buffers; donation needs them split
        trainable = jax.tree_util.tree_map(jnp.array, params["controlnet"])
        state = TrainState(
            params=trainable,
            opt_state=self.tx.init(trainable),
            step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            rep = replicated(self.mesh)
            state = jax.device_put(state, rep)
            self._frozen = jax.device_put(self._frozen, rep)
        return state

    # -- loss ------------------------------------------------------------

    def _loss_fn(self, cn_params, frozen, batch, key):
        pipe = self.pipe
        cfg = self.cfg
        k_noise, k_t, k_sample = jax.random.split(key, 3)

        pixel_values, cond_values = normalize_image_batch(
            batch["pixel_values"], batch["conditioning_pixel_values"]
        )  # (B,H,W,3) in [-1,1] / [0,1]
        input_ids = batch["input_ids"]  # (B,77)
        bsz = pixel_values.shape[0]

        if cfg.augmentations:
            from genima_tpu.data.augment import controlnet_train_augment

            key, k_aug = jax.random.split(key)
            pixel_values, cond_values = controlnet_train_augment(
                k_aug, pixel_values, cond_values, cfg.augmentations
            )

        dist = pipe.vae.apply(
            {"params": frozen["vae"]}, pixel_values.astype(pipe.dtype),
            method=pipe.vae.encode,
        )
        latents = dist.sample(k_sample).astype(jnp.float32)
        latents = latents * pipe.vae_cfg.scaling_factor

        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        timesteps = sample_train_timesteps(cfg, k_t, bsz)
        noisy = add_noise(self.alphas_cumprod, latents, noise, timesteps)

        encoder_out = pipe.text_encoder.apply(
            {"params": frozen["text_encoder"]}, input_ids
        )
        context = encoder_out.last_hidden_state

        def model_eps(cn_params, unet_params, noisy, cond):
            down_res, mid_res = pipe.controlnet.apply(
                {"params": cn_params},
                noisy,
                timesteps.astype(jnp.float32),
                context,
                cond,
            )
            return pipe.unet.apply(
                {"params": unet_params},
                noisy,
                timesteps.astype(jnp.float32),
                context,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid_res,
            )

        if cfg.gradient_checkpointing:
            model_eps = jax.checkpoint(
                model_eps, policy=jax.checkpoint_policies.nothing_saveable
            )
        eps_pred = model_eps(
            cn_params, frozen["unet"], noisy.astype(pipe.dtype),
            cond_values.astype(pipe.dtype),
        )
        if cfg.scheduler_config.prediction_type == "epsilon":
            target = noise
        elif cfg.scheduler_config.prediction_type == "v_prediction":
            target = get_velocity(self.alphas_cumprod, latents, noise, timesteps)
        else:
            raise ValueError(cfg.scheduler_config.prediction_type)
        loss = jnp.mean((eps_pred.astype(jnp.float32) - target) ** 2)
        return loss

    def _step_impl(self, state: TrainState, frozen, batch, key):
        loss, grads = jax.value_and_grad(self._loss_fn)(
            state.params, frozen, batch, key
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1, state.ema)
        lr = make_lr_schedule(self.cfg)(state.step)
        metrics = {"loss": loss, "lr": lr}
        if self.cfg.log_grad_norm:
            metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    def train_step(self, state: TrainState, batch, key):
        """One jitted DP training step. ``batch`` should be sharded over the
        mesh's data axis (``core.mesh.shard_batch``)."""
        if self._jit_step is None:
            if self.mesh is not None:
                rep = replicated(self.mesh)
                data = data_sharding(self.mesh)
                self._jit_step = jax.jit(
                    self._step_impl,
                    in_shardings=(rep, rep, data, rep),
                    out_shardings=(rep, rep),
                    donate_argnums=(0,),
                )
            else:
                self._jit_step = jax.jit(self._step_impl, donate_argnums=(0,))
        return self._jit_step(state, self._frozen, batch, key)


class SDXLControlNetTrainer(ControlNetTrainer):
    """SDXL variant (reference ``train_controlnet_sdxl_genima.py``): dual
    text encoders (penultimate hidden states concatenated, pooled embeds
    from encoder 2) + text_time micro-conditioning ``add_time_ids``
    (orig size, crop coords, target size; ``:1232-1261``).

    Divergence note: the reference precomputes text embeddings via
    ``dataset.map`` then frees the encoders (a GPU-memory measure,
    ``:1263-1286``); here both frozen encoders run inside the jitted step —
    cheaper than a host round-trip on TPU and bit-identical in result.
    """

    def __init__(self, pipe, cfg: TrainConfig, mesh=None, resolution: int = 512):
        super().__init__(pipe, cfg, mesh)
        self.resolution = resolution

    def _loss_fn(self, cn_params, frozen, batch, key):
        pipe = self.pipe
        cfg = self.cfg
        k_noise, k_t, k_sample = jax.random.split(key, 3)

        pixel_values, cond_values = normalize_image_batch(
            batch["pixel_values"], batch["conditioning_pixel_values"]
        )
        input_ids = batch["input_ids"]
        bsz = pixel_values.shape[0]

        dist = pipe.vae.apply(
            {"params": frozen["vae"]}, pixel_values.astype(pipe.dtype),
            method=pipe.vae.encode,
        )
        latents = dist.sample(k_sample).astype(jnp.float32)
        latents = latents * pipe.vae_cfg.scaling_factor

        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        timesteps = sample_train_timesteps(cfg, k_t, bsz)
        noisy = add_noise(self.alphas_cumprod, latents, noise, timesteps)

        out1 = pipe.text_encoder.apply(
            {"params": frozen["text_encoder"]}, input_ids
        )
        out2 = pipe.text_encoder_2.apply(
            {"params": frozen["text_encoder_2"]}, input_ids
        )
        context = jnp.concatenate(
            [out1.penultimate_hidden_state, out2.penultimate_hidden_state], -1
        )
        added = {
            "text_embeds": out2.text_embeds,
            "time_ids": pipe.make_time_ids(bsz, self.resolution),
        }

        def model_eps(cn_params, unet_params, noisy, cond):
            down_res, mid_res = pipe.controlnet.apply(
                {"params": cn_params},
                noisy,
                timesteps.astype(jnp.float32),
                context,
                cond,
                added_cond_kwargs=added,
            )
            return pipe.unet.apply(
                {"params": unet_params},
                noisy,
                timesteps.astype(jnp.float32),
                context,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid_res,
                added_cond_kwargs=added,
            )

        if cfg.gradient_checkpointing:
            model_eps = jax.checkpoint(
                model_eps, policy=jax.checkpoint_policies.nothing_saveable
            )
        eps_pred = model_eps(
            cn_params, frozen["unet"], noisy.astype(pipe.dtype),
            cond_values.astype(pipe.dtype),
        )
        if cfg.scheduler_config.prediction_type == "epsilon":
            target = noise
        else:
            target = get_velocity(self.alphas_cumprod, latents, noise, timesteps)
        return jnp.mean((eps_pred.astype(jnp.float32) - target) ** 2)


class Pix2PixTrainer(ControlNetTrainer):
    """InstructPix2Pix fine-tune (reference
    ``train_instruct_pix2pix_genima.py``): trains the WHOLE 8-channel UNet;
    the conditioning image is VAE-encoded with ``.mode()`` and channel-
    concatenated with the noisy latents (``:1196-1236``); classifier-free
    conditioning dropout masks prompt/image (``:1202-1231``); optional EMA
    of the UNet (``:1269-1273``).
    """

    def __init__(
        self,
        pipe,
        cfg: TrainConfig,
        mesh=None,
        conditioning_dropout_prob: float | None = 0.05,
        use_ema: bool = False,
        ema_decay: float = 0.9999,
        null_token_ids=None,
    ):
        super().__init__(pipe, cfg, mesh)
        self.conditioning_dropout_prob = conditioning_dropout_prob
        self.use_ema = use_ema
        self.ema_decay = ema_decay
        self.null_token_ids = null_token_ids

    def create_state(self, params: dict) -> TrainState:
        self._frozen = {k: v for k, v in params.items() if k != "unet"}
        trainable = jax.tree_util.tree_map(jnp.array, params["unet"])
        state = TrainState(
            params=trainable,
            opt_state=self.tx.init(trainable),
            step=jnp.zeros((), jnp.int32),
            # real copies — ema shares the donated TrainState, so aliasing
            # the param buffers would donate them twice
            ema=(
                jax.tree_util.tree_map(jnp.copy, trainable)
                if self.use_ema
                else None
            ),
        )
        if self.mesh is not None:
            rep = replicated(self.mesh)
            state = jax.device_put(state, rep)
            self._frozen = jax.device_put(self._frozen, rep)
        return state

    def _loss_fn(self, unet_params, frozen, batch, key):
        pipe = self.pipe
        cfg = self.cfg
        k_noise, k_t, k_sample, k_drop = jax.random.split(key, 4)

        pixel_values, cond_values = normalize_image_batch(
            batch["pixel_values"], batch["conditioning_pixel_values"]
        )  # edited/target [-1,1]; original [0,1]
        input_ids = batch["input_ids"]
        bsz = pixel_values.shape[0]

        dist = pipe.vae.apply(
            {"params": frozen["vae"]}, pixel_values.astype(pipe.dtype),
            method=pipe.vae.encode,
        )
        latents = dist.sample(k_sample).astype(jnp.float32)
        latents = latents * pipe.vae_cfg.scaling_factor

        # conditioning image in [-1,1] for the VAE, encoded with mode()
        cond_in = cond_values * 2.0 - 1.0
        image_embeds = pipe.vae.apply(
            {"params": frozen["vae"]}, cond_in.astype(pipe.dtype),
            method=pipe.vae.encode,
        ).mode().astype(jnp.float32)

        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        timesteps = sample_train_timesteps(cfg, k_t, bsz)
        noisy = add_noise(self.alphas_cumprod, latents, noise, timesteps)

        context = pipe.text_encoder.apply(
            {"params": frozen["text_encoder"]}, input_ids
        ).last_hidden_state

        if self.conditioning_dropout_prob:
            p = self.conditioning_dropout_prob
            random_p = jax.random.uniform(k_drop, (bsz,))
            # prompt dropped when random_p < 2p
            null_ids = (
                jnp.asarray(self.null_token_ids, jnp.int32)
                if self.null_token_ids is not None
                else jnp.zeros((1, input_ids.shape[1]), jnp.int32)
            )
            null_ctx = pipe.text_encoder.apply(
                {"params": frozen["text_encoder"]}, null_ids
            ).last_hidden_state
            prompt_mask = (random_p < 2 * p)[:, None, None]
            context = jnp.where(prompt_mask, null_ctx, context)
            # image dropped when p <= random_p < 3p
            image_mask = 1.0 - (
                (random_p >= p) & (random_p < 3 * p)
            ).astype(image_embeds.dtype)
            image_embeds = image_embeds * image_mask[:, None, None, None]

        model_in = jnp.concatenate(
            [noisy.astype(pipe.dtype), image_embeds.astype(pipe.dtype)], axis=-1
        )

        def model_eps(unet_params, model_in):
            return pipe.unet.apply(
                {"params": unet_params},
                model_in,
                timesteps.astype(jnp.float32),
                context,
            )

        if cfg.gradient_checkpointing:
            model_eps = jax.checkpoint(
                model_eps, policy=jax.checkpoint_policies.nothing_saveable
            )
        eps_pred = model_eps(unet_params, model_in)
        if cfg.scheduler_config.prediction_type == "epsilon":
            target = noise
        else:
            target = get_velocity(self.alphas_cumprod, latents, noise, timesteps)
        return jnp.mean((eps_pred.astype(jnp.float32) - target) ** 2)

    def _step_impl(self, state, frozen, batch, key):
        new_state, metrics = super()._step_impl(state, frozen, batch, key)
        if self.use_ema:
            # in-graph EMA (one fused update, reference
            # train_instruct_pix2pix_genima.py:1269-1273); lives in the
            # TrainState so it checkpoints/resumes with the run
            d = self.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1 - d), state.ema, new_state.params
            )
            new_state = new_state._replace(ema=ema)
        return new_state, metrics
