"""Base-model pretraining + tiny-VAE distillation (diffusion/pretrain.py).

The reference downloads sd-turbo and the released taesd
(``train_controlnet_genima.py:1042-1109``, ``sd_controlnet_agent.py:44-49``);
these stages train the same artifacts in-framework for domains with no
release. Tests pin: losses actually fall, the saved snapshot is the layout
``--pretrained_model_name_or_path`` / the eval agents consume, and the
distilled tiny decoder measurably approaches the full decoder (the
quality-bound metric serving uses to decide on ``use_tiny_vae``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genima_tpu.diffusion.pipeline import SDControlNetPipeline
from genima_tpu.diffusion.pretrain import (
    TinyVAEDistiller,
    UNetPretrainer,
    VAETrainer,
    distill_tiny_vae,
    pretrain_base_model,
    save_base_model,
    tiny_vae_decode_psnr,
)
from genima_tpu.diffusion.training import TrainConfig
from genima_tpu.nn.clip_text import CLIPTextConfig
from genima_tpu.nn.unet import UNetConfig
from genima_tpu.nn.vae import VAEConfig

SIZE = 32


class _Loader:
    """Synthetic structured images (the gate's marker-like statistics:
    flat background + a few colored discs), fixed set, epoch iteration."""

    def __init__(self, n_batches=4, batch=4, size=SIZE, seed=0):
        rng = np.random.RandomState(seed)
        self.batches = []
        for _ in range(n_batches):
            img = np.full((batch, size, size, 3), 128, np.uint8)
            for b in range(batch):
                for _k in range(3):
                    y, x = rng.randint(4, size - 4, 2)
                    c = rng.randint(0, 255, 3)
                    img[b, y - 2 : y + 2, x - 2 : x + 2] = c
            self.batches.append(
                {
                    "pixel_values": img,
                    "conditioning_pixel_values": img[:, ::-1].copy(),
                    "input_ids": rng.randint(
                        0, 99, (batch, 77), np.int64
                    ),
                }
            )

    def __iter__(self):
        return iter(self.batches)


@pytest.fixture(scope="module")
def tiny_pipe():
    pipe = SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
        use_tiny_vae=True,
    )
    params = pipe.init_params(jax.random.key(0), image_size=SIZE, fast=False)
    return pipe, params


def _loss_at(trainer, params, batch, key):
    state = trainer.create_state(params)
    return float(
        trainer._loss_fn(state.params, trainer._frozen, batch, key)
    )


def test_vae_pretrain_reduces_loss(tiny_pipe):
    pipe, params = tiny_pipe
    params = {k: v for k, v in params.items()}
    loader = _Loader()
    batch = {
        k: jnp.asarray(v) for k, v in next(iter(loader)).items()
    }
    key = jax.random.key(1)
    cfg = TrainConfig(
        learning_rate=2e-3, max_train_steps=40, lr_scheduler="constant",
        lr_warmup_steps=0, adam_weight_decay=0.0, log_grad_norm=False,
    )
    before = _loss_at(VAETrainer(pipe, cfg), params, batch, key)
    out = pretrain_base_model(
        pipe, params, loader, vae_steps=40, unet_steps=2, seed=0,
        log_every=20,
    )
    after = _loss_at(VAETrainer(pipe, cfg), out, batch, key)
    assert after < before * 0.8, (before, after)


def test_unet_pretrain_reduces_loss(tiny_pipe):
    pipe, params = tiny_pipe
    params = {k: v for k, v in params.items()}
    loader = _Loader()
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    key = jax.random.key(2)
    cfg = TrainConfig(
        learning_rate=1e-3, max_train_steps=60, lr_scheduler="constant",
        lr_warmup_steps=0, log_grad_norm=False,
    )
    before = _loss_at(UNetPretrainer(pipe, cfg), params, batch, key)
    out = pretrain_base_model(
        pipe, params, loader, vae_steps=2, unet_steps=60, seed=0,
        log_every=30,
    )
    after = _loss_at(UNetPretrainer(pipe, cfg), out, batch, key)
    assert after < before, (before, after)


def test_distill_tiny_vae_improves_psnr(tiny_pipe):
    """The taesd recipe in-framework: distilling the tiny decoder against
    the full KL decoder measurably raises the decode-PSNR quality bound."""
    pipe, params = tiny_pipe
    params = {k: v for k, v in params.items()}
    loader = _Loader()
    images = next(iter(loader))["pixel_values"]
    before = tiny_vae_decode_psnr(pipe, params, images)
    # convergence profile (CPU probe, this config): +2 dB by step 60,
    # +5.5 dB by 100, ~30 dB absolute by 400 — 150 steps clears +4 dB
    # with a wide margin while keeping the test under a minute of compute
    out = distill_tiny_vae(pipe, params, loader, steps=150, lr=4e-3)
    after = tiny_vae_decode_psnr(pipe, out, images)
    assert after > before + 4.0, (before, after)


def test_distiller_requires_tiny_tree():
    pipe = SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    params = pipe.init_params(jax.random.key(0), image_size=SIZE)
    cfg = TrainConfig(learning_rate=1e-3, max_train_steps=1)
    with pytest.raises(ValueError, match="tiny_vae"):
        TinyVAEDistiller(pipe, cfg).create_state(params)


def test_save_base_model_layout_roundtrip(tiny_pipe, tmp_path):
    """The snapshot is what --pretrained_model_name_or_path and the eval
    agents' sd_ckpt consume: per-submodel dirs + the one-file tree."""
    from genima_tpu.core import checkpoint as ckpt

    pipe, params = tiny_pipe
    out = save_base_model(tmp_path / "base", params)
    for name in ("vae", "unet", "text_encoder", "tiny_vae"):
        assert (out / name / "params.msgpack").exists(), name
    tree = ckpt.load_pytree(out / "params.msgpack")
    assert "controlnet" not in tree
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(tree["vae"])[0]),
        np.asarray(jax.tree_util.tree_leaves(params["vae"])[0]),
    )
