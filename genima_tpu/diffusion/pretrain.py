"""Base-model pretraining: VAE reconstruction + UNet denoising.

The reference never trains these towers — it downloads ``stabilityai/
sd-turbo`` and fine-tunes a ControlNet against the frozen base
(``/root/reference/diffusion/train_controlnet_genima.py:1042-1109``). That
works because SD's VAE/UNet already model natural images. A from-scratch
deployment (new visual domain, no pretrained weights available — e.g. the
offline learning gate, or a non-natural-image robot domain) needs the same
two capabilities trained in-framework:

* ``VAETrainer`` — reconstruction (MSE + beta * KL) of the AutoencoderKL so
  latents round-trip the target domain,
* ``UNetPretrainer`` — epsilon-prediction denoising of the bare UNet on the
  target-image distribution (the "base model"; the ControlNet fine-tune
  then adds spatial conditioning exactly as it does over SD).

Both reuse the fine-tune machinery (``TrainConfig``, LR schedules, the
sharded-jit step with donation) so pretraining data-parallelizes over a
mesh the same way the ControlNet fine-tune does. ``save_base_model`` writes
the HF-hub-style layout ``<dir>/{vae,unet,text_encoder}/params.msgpack``
that ``weights.load_pretrained.load_pretrained_pipeline`` (and therefore
``--pretrained_model_name_or_path``) consumes — the offline stand-in for
the reference's snapshot download.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from genima_tpu.core import checkpoint as ckpt
from genima_tpu.core.mesh import data_sharding, replicated
from genima_tpu.diffusion.training import (
    ControlNetTrainer,
    TrainConfig,
    TrainState,
    normalize_image_batch,
)


class VAETrainer(ControlNetTrainer):
    """Trains ``params['vae']``: reconstruction + beta-weighted KL."""

    def __init__(self, pipe, cfg: TrainConfig, mesh=None, kl_weight=1e-6):
        super().__init__(pipe, cfg, mesh)
        self.kl_weight = kl_weight

    def create_state(self, params: dict) -> TrainState:
        self._frozen = {k: v for k, v in params.items() if k != "vae"}
        trainable = jax.tree_util.tree_map(jnp.array, params["vae"])
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

    def _loss_fn(self, vae_params, frozen, batch, key):
        pipe = self.pipe
        pixel_values, _ = normalize_image_batch(
            batch["pixel_values"], batch["conditioning_pixel_values"]
        )
        x = pixel_values.astype(pipe.dtype)
        dist = pipe.vae.apply(
            {"params": vae_params}, x, method=pipe.vae.encode
        )
        z = dist.sample(key)
        recon = pipe.vae.apply(
            {"params": vae_params}, z, method=pipe.vae.decode
        )
        rec = jnp.mean(
            (recon.astype(jnp.float32) - pixel_values.astype(jnp.float32))
            ** 2
        )
        kl = 0.5 * jnp.mean(
            dist.mean.astype(jnp.float32) ** 2
            + jnp.exp(dist.logvar.astype(jnp.float32))
            - 1.0
            - dist.logvar.astype(jnp.float32)
        )
        return rec + self.kl_weight * kl


class UNetPretrainer(ControlNetTrainer):
    """Trains ``params['unet']``: plain epsilon-prediction denoising (the
    ControlNet fine-tune loss minus the ControlNet — the base model)."""

    def create_state(self, params: dict) -> TrainState:
        self._frozen = {
            k: v for k, v in params.items() if k not in ("unet", "controlnet")
        }
        trainable = jax.tree_util.tree_map(jnp.array, params["unet"])
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

    def _loss_fn(self, unet_params, frozen, batch, key):
        pipe = self.pipe
        cfg = self.cfg
        k_noise, k_t, k_sample = jax.random.split(key, 3)

        pixel_values, _ = normalize_image_batch(
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
        from genima_tpu.diffusion.training import sample_train_timesteps

        timesteps = sample_train_timesteps(cfg, k_t, bsz)
        from genima_tpu.diffusion.schedulers import add_noise, get_velocity

        noisy = add_noise(self.alphas_cumprod, latents, noise, timesteps)

        context = pipe.text_encoder.apply(
            {"params": frozen["text_encoder"]}, input_ids
        ).last_hidden_state

        eps_pred = pipe.unet.apply(
            {"params": unet_params},
            noisy.astype(pipe.dtype),
            timesteps.astype(jnp.float32),
            context,
        )
        if cfg.scheduler_config.prediction_type == "epsilon":
            target = noise
        else:
            target = get_velocity(self.alphas_cumprod, latents, noise, timesteps)
        return jnp.mean((eps_pred.astype(jnp.float32) - target) ** 2)


def pretrain_base_model(
    pipe,
    params: dict,
    loader,
    vae_steps: int = 300,
    unet_steps: int = 300,
    vae_lr: float = 2e-3,
    unet_lr: float = 1e-3,
    mesh=None,
    seed: int = 0,
    log_every: int = 50,
    train_timestep_grid: tuple[int, ...] | None = None,
) -> dict:
    """Train VAE then UNet on ``loader`` batches; returns updated params.
    The two stages are sequential by construction: the UNet denoises in the
    latent space the (now-trained) VAE defines."""
    from genima_tpu.core.mesh import shard_batch

    def run(trainer, steps, tag):
        state = trainer.create_state(params)
        key = jax.random.key(seed)
        it = iter(loader)
        last = None
        for step in range(steps):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(loader)
                batch = next(it)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            key, sub = jax.random.split(key)
            state, metrics = trainer.train_step(state, batch, sub)
            if step % log_every == 0 or step == steps - 1:
                last = float(metrics["loss"])
                print(f"pretrain[{tag}] step {step}: loss={last:.5f}")
        return state.params

    vae_cfg = TrainConfig(
        learning_rate=vae_lr, max_train_steps=vae_steps,
        lr_scheduler="cosine", lr_warmup_steps=min(50, vae_steps // 4),
        adam_weight_decay=0.0, log_grad_norm=False,
    )
    params["vae"] = run(VAETrainer(pipe, vae_cfg, mesh), vae_steps, "vae")

    unet_cfg = TrainConfig(
        learning_rate=unet_lr, max_train_steps=unet_steps,
        lr_scheduler="cosine", lr_warmup_steps=min(50, unet_steps // 4),
        log_grad_norm=False,
        train_timestep_grid=train_timestep_grid,
    )
    params["unet"] = run(
        UNetPretrainer(pipe, unet_cfg, mesh), unet_steps, "unet"
    )
    return params


class TinyVAEDistiller(ControlNetTrainer):
    """Distills ``params['tiny_vae']``'s decoder against the full KL
    decoder — the taesd recipe (the reference consumes the released
    ``madebyollin/taesd`` weights, ``sd_controlnet_agent.py:44-49``; this
    trains the same artifact in-framework for domains where no release
    exists). Loss: MSE between the tiny decode and the FULL decode of the
    same scaled latents, so the student matches what serving swaps out —
    the decoder only (``SDControlNetPipeline._decode_latents``)."""

    def create_state(self, params: dict) -> TrainState:
        if "tiny_vae" not in params:
            raise ValueError(
                "params has no 'tiny_vae' tree — build the pipeline with "
                "use_tiny_vae=True (init_params then emits it)"
            )
        self._frozen = {k: v for k, v in params.items() if k != "tiny_vae"}
        trainable = jax.tree_util.tree_map(jnp.array, params["tiny_vae"])
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

    def _loss_fn(self, tiny_params, frozen, batch, key):
        pipe = self.pipe
        pixel_values, _ = normalize_image_batch(
            batch["pixel_values"], batch["conditioning_pixel_values"]
        )
        dist = pipe.vae.apply(
            {"params": frozen["vae"]}, pixel_values.astype(pipe.dtype),
            method=pipe.vae.encode,
        )
        # deterministic teacher latents, scaled like serving hands them over
        z = dist.mode().astype(jnp.float32) * pipe.vae_cfg.scaling_factor
        teacher = pipe.vae.apply(
            {"params": frozen["vae"]},
            (z / pipe.vae_cfg.scaling_factor).astype(pipe.dtype),
            method=pipe.vae.decode,
        )
        student = pipe.tiny_vae.apply(
            {"params": tiny_params}, z.astype(pipe.dtype),
            method=pipe.tiny_vae.decode,
        )
        return jnp.mean(
            (student.astype(jnp.float32) - teacher.astype(jnp.float32)) ** 2
        )


def distill_tiny_vae(
    pipe,
    params: dict,
    loader,
    steps: int = 300,
    lr: float = 1e-3,
    mesh=None,
    seed: int = 0,
    log_every: int = 50,
) -> dict:
    """Train ``params['tiny_vae']`` to mimic the full decoder on ``loader``
    images; returns updated params. Measure the result with
    ``tiny_vae_decode_psnr`` — the quality bound that decides whether
    serving can flip ``use_tiny_vae`` for this domain."""
    from genima_tpu.core.mesh import shard_batch

    cfg = TrainConfig(
        learning_rate=lr, max_train_steps=steps, lr_scheduler="cosine",
        lr_warmup_steps=min(50, steps // 4), adam_weight_decay=0.0,
        log_grad_norm=False,
    )
    trainer = TinyVAEDistiller(pipe, cfg, mesh)
    state = trainer.create_state(params)
    key = jax.random.key(seed)
    it = iter(loader)
    for step in range(steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        key, sub = jax.random.split(key)
        state, metrics = trainer.train_step(state, batch, sub)
        if step % log_every == 0 or step == steps - 1:
            print(
                f"distill[tiny_vae] step {step}: "
                f"loss={float(metrics['loss']):.5f}"
            )
    params["tiny_vae"] = state.params
    return params


def tiny_vae_decode_psnr(pipe, params: dict, images) -> float:
    """PSNR (dB, [-1,1] signal -> peak 2.0) of the tiny decode against the
    full KL decode on the same deterministic latents — the measured bound
    on what flipping ``use_tiny_vae`` costs for this image domain."""
    x = jnp.asarray(images)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 127.5 - 1.0
    dist = pipe.vae.apply(
        {"params": params["vae"]}, x.astype(pipe.dtype),
        method=pipe.vae.encode,
    )
    z = dist.mode().astype(jnp.float32)
    teacher = pipe.vae.apply(
        {"params": params["vae"]}, z.astype(pipe.dtype),
        method=pipe.vae.decode,
    ).astype(jnp.float32)
    student = pipe.tiny_vae.apply(
        {"params": params["tiny_vae"]},
        (z * pipe.vae_cfg.scaling_factor).astype(pipe.dtype),
        method=pipe.tiny_vae.decode,
    ).astype(jnp.float32)
    mse = float(jnp.mean((student - teacher) ** 2))
    return float(10.0 * np.log10(4.0 / max(mse, 1e-12)))


def save_base_model(out_dir: str | Path, params: dict) -> Path:
    """HF-hub-style snapshot: ``<dir>/<submodel>/params.msgpack`` for every
    base tower present — what ``--pretrained_model_name_or_path`` loads."""
    out_dir = Path(out_dir)
    for name in ("vae", "unet", "text_encoder", "text_encoder_2", "tiny_vae"):
        if name in params:
            d = out_dir / name
            d.mkdir(parents=True, exist_ok=True)
            ckpt.save_pytree(params[name], d / "params.msgpack")
    # one-file layout for DiffusionAgent.sd_ckpt (eval-side base weights)
    ckpt.save_pytree(
        {k: v for k, v in params.items() if k != "controlnet"},
        out_dir / "params.msgpack",
    )
    return out_dir
