"""Diffusion trainer variants: SDXL ControlNet and InstructPix2Pix."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genima_tpu.diffusion.pipeline import (
    SDControlNetPipeline,
    SDPix2PixPipeline,
    SDXLControlNetPipeline,
)
from genima_tpu.diffusion.training import (
    ControlNetTrainer,
    Pix2PixTrainer,
    SDXLControlNetTrainer,
    TrainConfig,
    make_lr_schedule,
)
from genima_tpu.nn.clip_text import CLIPTextConfig
from genima_tpu.nn.unet import UNetConfig
from genima_tpu.nn.vae import VAEConfig


def _batch(bsz=2, size=16):
    rng = np.random.RandomState(0)
    return {
        "pixel_values": jnp.asarray(
            rng.uniform(-1, 1, (bsz, size, size, 3)).astype(np.float32)
        ),
        "conditioning_pixel_values": jnp.asarray(
            rng.uniform(0, 1, (bsz, size, size, 3)).astype(np.float32)
        ),
        "input_ids": jnp.zeros((bsz, 77), jnp.int32),
    }


def test_sdxl_trainer_step():
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
    params = pipe.init_params(jax.random.key(0), image_size=16)
    trainer = SDXLControlNetTrainer(
        pipe, TrainConfig(learning_rate=1e-4), resolution=16
    )
    state = trainer.create_state(params)
    before = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]
    ).copy()
    for i in range(2):
        state, m = trainer.train_step(state, _batch(), jax.random.key(i))
    assert np.isfinite(float(m["loss"]))
    after = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    # controlnet trains; frozen unet untouched
    assert not np.array_equal(before, after)
    assert "unet" in trainer._frozen and "text_encoder_2" in trainer._frozen


def test_pix2pix_trainer_step_with_dropout_and_ema():
    pipe = SDPix2PixPipeline(
        unet_cfg=UNetConfig.tiny(in_channels=8),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    params = pipe.init_params(jax.random.key(1), image_size=16)
    trainer = Pix2PixTrainer(
        pipe,
        TrainConfig(learning_rate=1e-4),
        conditioning_dropout_prob=0.3,
        use_ema=True,
        ema_decay=0.5,
    )
    state = trainer.create_state(params)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    for i in range(3):
        state, m = trainer.train_step(state, _batch(), jax.random.key(i))
    assert np.isfinite(float(m["loss"]))
    # the UNet is the trainable model here
    leaf0 = jax.tree_util.tree_leaves(p0)[0]
    leaf1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.array_equal(leaf0, leaf1)
    # EMA tracked in-graph (TrainState.ema) and differs from current params
    ema_leaf = np.asarray(jax.tree_util.tree_leaves(state.ema)[0])
    assert not np.array_equal(ema_leaf, leaf1)
    assert np.isfinite(ema_leaf).all()
    # exact decay semantics on a hand-tracked leaf: e' = d*e + (1-d)*p
    ref = jax.tree_util.tree_leaves(p0)[0]
    state2 = trainer.create_state(params)
    seen_p = [np.asarray(jax.tree_util.tree_leaves(state2.params)[0])]
    for i in range(2):
        state2, _ = trainer.train_step(state2, _batch(), jax.random.key(i))
        seen_p.append(np.asarray(jax.tree_util.tree_leaves(state2.params)[0]))
    e = np.asarray(ref)
    for p in seen_p[1:]:
        e = e * 0.5 + p * 0.5
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state2.ema)[0]), e, rtol=1e-5
    )


def test_pix2pix_ema_checkpointed_and_resumed(tmp_path):
    """EMA params survive a step-checkpoint save/load round trip
    (reference keeps EMA weights in the accelerate state)."""
    from genima_tpu.core import checkpoint as ckpt

    pipe = SDPix2PixPipeline(
        unet_cfg=UNetConfig.tiny(in_channels=8),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    params = pipe.init_params(jax.random.key(1), image_size=16)
    trainer = Pix2PixTrainer(
        pipe, TrainConfig(learning_rate=1e-4), use_ema=True, ema_decay=0.5
    )
    state = trainer.create_state(params)
    state, _ = trainer.train_step(state, _batch(), jax.random.key(0))
    ckpt.save_step_checkpoint(
        tmp_path, 1, model_params=state.params, model_subdir="unet",
        train_state={"opt_state": state.opt_state, "step": state.step},
        extra={"ema": state.ema},
    )
    restored = ckpt.load_pytree(
        tmp_path / "checkpoint-1" / "ema.msgpack", target=state.ema
    )
    a = jax.tree_util.tree_leaves(state.ema)[0]
    b = jax.tree_util.tree_leaves(restored)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_turbo_timestep_sampling():
    from genima_tpu.diffusion.training import TURBO_TIMESTEPS

    assert TURBO_TIMESTEPS == (999, 749, 499, 249, 0)


def test_sample_train_timesteps_policies():
    """Grid > turbo > uniform precedence, and grid-only emission — training
    on the serving sampler's exact few-step grid is what makes a
    from-scratch base model coherent at few-step inference."""
    from genima_tpu.diffusion.training import (
        TURBO_TIMESTEPS,
        sample_train_timesteps,
    )

    key = jax.random.key(0)
    grid = (999, 799, 599, 399, 199)
    cfg = TrainConfig(train_timestep_grid=grid)
    ts = np.asarray(sample_train_timesteps(cfg, key, 256))
    assert set(ts.tolist()) <= set(grid)
    assert len(set(ts.tolist())) > 1  # actually sampling, not constant

    cfg = TrainConfig(timestep_spacing="turbo_timesteps")
    ts = np.asarray(sample_train_timesteps(cfg, key, 256))
    assert set(ts.tolist()) <= set(TURBO_TIMESTEPS)

    # grid overrides spacing when both are set
    cfg = TrainConfig(
        timestep_spacing="turbo_timesteps", train_timestep_grid=grid
    )
    ts = np.asarray(sample_train_timesteps(cfg, key, 256))
    assert set(ts.tolist()) <= set(grid)

    cfg = TrainConfig()
    ts = np.asarray(sample_train_timesteps(cfg, key, 512))
    assert ts.min() >= 0 and ts.max() < 1000
    assert len(set(ts.tolist())) > len(grid)  # uniform, not grid-locked


def test_train_timestep_grid_cli_wiring():
    from genima_tpu.cli.train_controlnet_genima import parse_args

    args = parse_args(
        ["--data_path", "/tmp/x", "--output_dir", "/tmp/y",
         "--train_timestep_grid", "999,799,599,399,199"]
    )
    assert args.train_timestep_grid == "999,799,599,399,199"


def test_lr_schedules():
    cfg = TrainConfig(
        learning_rate=1e-3, lr_scheduler="constant_with_warmup",
        lr_warmup_steps=10, max_train_steps=100,
    )
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 1e-3, rtol=1e-6)

    lin = make_lr_schedule(
        TrainConfig(learning_rate=1e-3, lr_scheduler="linear",
                    lr_warmup_steps=10, max_train_steps=110)
    )
    np.testing.assert_allclose(float(lin(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(lin(110)), 0.0, atol=1e-9)

    cos = make_lr_schedule(
        TrainConfig(learning_rate=1e-3, lr_scheduler="cosine",
                    lr_warmup_steps=10, max_train_steps=100)
    )
    assert float(cos(100)) < 1e-4


def test_adamw_8bit_tracks_adamw():
    """Blockwise int8 AdamW (the --use_8bit_adam knob) stays close to f32
    AdamW over steps and shrinks the optimizer state ~4x."""
    import optax

    from genima_tpu.core.optim import adamw_8bit, optimizer_state_bytes

    rng = np.random.RandomState(0)
    params = {
        "w": jnp.asarray(rng.randn(64, 128).astype(np.float32) * 0.1),
        "small": jnp.asarray(rng.randn(7).astype(np.float32)),
    }
    tx8 = adamw_8bit(1e-2, weight_decay=1e-2)
    txf = optax.adamw(1e-2, weight_decay=1e-2)
    s8, sf = tx8.init(params), txf.init(params)
    p8 = pf = params

    @jax.jit
    def step8(p, s, g):
        u, s = tx8.update(g, s, p)
        return optax.apply_updates(p, u), s

    @jax.jit
    def stepf(p, s, g):
        u, s = txf.update(g, s, p)
        return optax.apply_updates(p, u), s

    for i in range(20):
        g = {
            "w": jnp.asarray(rng.randn(64, 128).astype(np.float32)),
            "small": jnp.asarray(rng.randn(7).astype(np.float32)),
        }
        p8, s8 = step8(p8, s8, g)
        pf, sf = stepf(pf, sf, g)
    # small params are exact (full-precision moments)
    np.testing.assert_allclose(
        np.asarray(p8["small"]), np.asarray(pf["small"]), rtol=1e-5
    )
    # quantized params track within quantization noise
    diff = np.abs(np.asarray(p8["w"]) - np.asarray(pf["w"]))
    denom = np.abs(np.asarray(pf["w"] - params["w"])).mean()
    assert diff.mean() < 0.15 * denom, (diff.mean(), denom)
    # memory: int8 moments ~4x smaller than f32 adamw state for w
    big8 = optimizer_state_bytes(s8)
    bigf = optimizer_state_bytes(sf)
    assert big8 < 0.42 * bigf, (big8, bigf)


def test_controlnet_trainer_8bit_adam_step():
    """The --use_8bit_adam path trains end-to-end in the jitted step."""
    pipe = SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    params = pipe.init_params(jax.random.key(0), image_size=16)
    trainer = ControlNetTrainer(
        pipe, TrainConfig(learning_rate=1e-4, use_8bit_adam=True)
    )
    state = trainer.create_state(params)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    for i in range(2):
        state, m = trainer.train_step(state, _batch(), jax.random.key(i))
    assert np.isfinite(float(m["loss"]))
    total_delta = sum(
        float(np.abs(np.asarray(a) - b).sum())
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(p0),
        )
    )
    assert total_delta > 0.0


def test_gradient_checkpointing_matches_plain():
    """--gradient_checkpointing (remat of the cn+unet region) is a memory
    knob only: the loss and the updated params match the plain step."""
    pipe = SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    params = pipe.init_params(jax.random.key(0), image_size=16)
    outs = {}
    for gc in (False, True):
        trainer = ControlNetTrainer(
            pipe,
            TrainConfig(learning_rate=1e-4, gradient_checkpointing=gc),
        )
        state = trainer.create_state(params)
        state, m = trainer.train_step(state, _batch(), jax.random.key(0))
        outs[gc] = (float(m["loss"]), state.params)
    # remat recomputation refuses bit-identity (different fusions) but must
    # agree to float tolerance
    np.testing.assert_allclose(outs[False][0], outs[True][0], rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(outs[False][1]),
        jax.tree_util.tree_leaves(outs[True][1]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_lr_cosine_with_restarts_closed_form():
    """diffusers get_cosine_with_hard_restarts_schedule_with_warmup:
    linear warmup, then 0.5*(1+cos(pi*((cycles*progress) mod 1))), 0 at end."""
    import numpy as np

    base, warmup, total, cycles = 2e-4, 10, 110, 3
    sched = make_lr_schedule(
        TrainConfig(
            learning_rate=base,
            lr_scheduler="cosine_with_restarts",
            lr_warmup_steps=warmup,
            max_train_steps=total,
            lr_num_cycles=cycles,
        )
    )

    def ref(step):
        if step < warmup:
            return base * step / max(1, warmup)
        progress = (step - warmup) / max(1, total - warmup)
        if progress >= 1.0:
            return 0.0
        return base * 0.5 * (1.0 + np.cos(np.pi * ((cycles * progress) % 1.0)))

    for step in [0, 1, 5, 10, 11, 26, 43, 60, 77, 94, 109, 110, 150]:
        # f32 cos near its zero loses relative precision; atol covers it
        np.testing.assert_allclose(
            float(sched(step)), ref(step), rtol=1e-4, atol=base * 1e-5,
            err_msg=f"step {step}",
        )
    # hard restart: lr jumps back near base at each cycle boundary
    cycle_len = (total - warmup) / cycles
    just_after_restart = int(warmup + cycle_len) + 1
    assert float(sched(just_after_restart)) > 0.9 * base


def test_lr_polynomial_closed_form():
    """diffusers get_polynomial_decay_schedule_with_warmup:
    (lr-lr_end)*(1-progress)^power + lr_end, floored at lr_end."""
    import numpy as np

    base, warmup, total, power, lr_end = 1e-4, 8, 58, 2.5, 1e-7
    sched = make_lr_schedule(
        TrainConfig(
            learning_rate=base,
            lr_scheduler="polynomial",
            lr_warmup_steps=warmup,
            max_train_steps=total,
            lr_power=power,
            lr_end=lr_end,
        )
    )

    def ref(step):
        if step < warmup:
            return base * step / max(1, warmup)
        if step > total:
            return lr_end
        progress = (step - warmup) / (total - warmup)
        return (base - lr_end) * (1 - progress) ** power + lr_end

    for step in [0, 3, 8, 9, 20, 33, 45, 57, 58, 99]:
        np.testing.assert_allclose(
            float(sched(step)), ref(step), rtol=1e-4, atol=base * 1e-6,
            err_msg=f"step {step}",
        )
