import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genima_tpu.diffusion.pipeline import (
    SDControlNetPipeline,
    SDPix2PixPipeline,
    SDXLControlNetPipeline,
)
from genima_tpu.nn.clip_text import CLIPTextConfig
from genima_tpu.nn.unet import UNetConfig
from genima_tpu.nn.vae import VAEConfig


@pytest.fixture(scope="module")
def sd_pipe():
    pipe = SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    params = pipe.init_params(jax.random.key(0), image_size=16)
    return pipe, params


def _ids():
    return jnp.zeros((1, 77), jnp.int32).at[:, 0].set(1).at[:, 1].set(999)


def test_generate_shapes_and_dtype(sd_pipe):
    pipe, params = sd_pipe
    embeds = pipe.encode_prompt(params, _ids())
    cond = jnp.zeros((1, 16, 16, 3))
    lat = pipe.init_latents(jax.random.key(1), 1, 16, 16)
    img = pipe.generate(params, cond, embeds, lat, num_inference_steps=5)
    assert img.shape == (1, 16, 16, 3)
    assert img.dtype == jnp.uint8


def test_generate_deterministic_given_latents(sd_pipe):
    """Fixed noise latents -> identical generations (the reference's fixed
    per-episode torch.Generator seed, eval_genima.py:129-135)."""
    pipe, params = sd_pipe
    embeds = pipe.encode_prompt(params, _ids())
    cond = jnp.zeros((1, 16, 16, 3))
    lat = pipe.init_latents(jax.random.key(2), 1, 16, 16)
    a = pipe.generate(params, cond, embeds, lat, num_inference_steps=5)
    b = pipe.generate(params, cond, embeds, lat, num_inference_steps=5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conditioning_image_matters(sd_pipe):
    pipe, params = sd_pipe
    # make the controlnet influential (zero convs are zero at init)
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["controlnet"] = jax.tree_util.tree_map(
        lambda x: x + 0.05, params["controlnet"]
    )
    embeds = pipe.encode_prompt(params, _ids())
    lat = pipe.init_latents(jax.random.key(3), 1, 16, 16)
    img0 = pipe.generate(params, jnp.zeros((1, 16, 16, 3)), embeds, lat)
    img1 = pipe.generate(params, jnp.ones((1, 16, 16, 3)), embeds, lat)
    assert np.abs(np.asarray(img0, np.int32) - np.asarray(img1, np.int32)).max() > 0


def test_cfg_branch(sd_pipe):
    pipe, params = sd_pipe
    embeds = pipe.encode_prompt(params, _ids())
    neg = jnp.zeros_like(embeds)
    cond = jnp.zeros((1, 16, 16, 3))
    lat = pipe.init_latents(jax.random.key(4), 1, 16, 16)
    img = pipe.generate(
        params, cond, embeds, lat,
        num_inference_steps=2, guidance_scale=7.5, negative_prompt_embeds=neg,
    )
    assert img.shape == (1, 16, 16, 3)


def test_steps_count_affects_output(sd_pipe):
    pipe, params = sd_pipe
    embeds = pipe.encode_prompt(params, _ids())
    cond = jnp.zeros((1, 16, 16, 3))
    lat = pipe.init_latents(jax.random.key(5), 1, 16, 16)
    a = pipe.generate(params, cond, embeds, lat, num_inference_steps=1)
    b = pipe.generate(params, cond, embeds, lat, num_inference_steps=5)
    assert a.shape == b.shape


def test_sdxl_pipeline_runs():
    pipe = SDXLControlNetPipeline(
        unet_cfg=UNetConfig.tiny(
            addition_embed_type="text_time", addition_time_embed_dim=8,
            cross_attention_dim=48,
        ),
        vae_cfg=VAEConfig.tiny_test(scaling_factor=0.13025),
        text_cfg=CLIPTextConfig.tiny(hidden_size=16, num_heads=2),
        text_cfg_2=CLIPTextConfig.tiny(hidden_size=32, projection_dim=16),
    )
    params = pipe.init_params(jax.random.key(6), image_size=16)
    ids = _ids()
    embeds, pooled = pipe.encode_prompt(params, ids)
    assert embeds.shape == (1, 77, 48)  # 16 + 32 concatenated
    assert pooled.shape == (1, 16)
    lat = pipe.init_latents(jax.random.key(7), 1, 16, 16)
    img = pipe.generate(
        params, jnp.zeros((1, 16, 16, 3)), embeds, pooled, lat,
        jax.random.key(8), num_inference_steps=2,
    )
    assert img.shape == (1, 16, 16, 3)


def test_pix2pix_pipeline_runs():
    pipe = SDPix2PixPipeline(
        unet_cfg=UNetConfig.tiny(in_channels=8),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
    )
    params = pipe.init_params(jax.random.key(9), image_size=16)
    embeds = pipe.encode_prompt(params, _ids())
    lat = pipe.init_latents(jax.random.key(10), 1, 16, 16)
    img = pipe.generate(
        params, jnp.zeros((1, 16, 16, 3)), embeds, lat, num_inference_steps=2
    )
    assert img.shape == (1, 16, 16, 3)


def test_decode_mode_single_matches_batched(sd_pipe):
    """Per-image lax.map decode (the v5e batch-2..7 workaround, PERF.md
    round 4) must be numerically identical to the native batched decode.
    The mode is a per-call argument, not a mutation of the pipeline."""
    pipe, params = sd_pipe
    lat = jax.random.normal(
        jax.random.key(11), (3, 2, 2, pipe.vae_cfg.latent_channels), jnp.float32
    )
    a = pipe._decode_latents(params, lat, "single")
    b = pipe._decode_latents(params, lat, "batched")
    assert pipe.decode_mode == "auto"  # untouched
    assert a.shape == b.shape == (3, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _spied_tiny_pipe(**pipe_kw):
    pipe = SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
        **pipe_kw,
    )
    calls = []
    orig = pipe._decode_one_batch

    def spy(params, sample):
        calls.append(sample.shape[0])
        return orig(params, sample)

    pipe._decode_one_batch = spy
    return pipe, calls


def test_decode_mode_auto_window():
    """'auto' decodes per-image exactly in the configured bad window
    (default the v5e-measured batch 2..7, scripts/ab_batch_scaling.py):
    N=1 and N>=8 stay on the native path."""
    pipe, calls = _spied_tiny_pipe()
    params = pipe.init_params(jax.random.key(0), image_size=16)
    for n, expect_single in [(1, False), (2, True), (7, True), (8, False)]:
        calls.clear()
        lat = jnp.zeros((n, 2, 2, pipe.vae_cfg.latent_channels), jnp.float32)
        pipe._decode_latents(params, lat)
        if expect_single:
            assert calls == [1], (n, calls)
        else:
            assert calls == [n], (n, calls)


def test_decode_single_window_configurable():
    """The 'auto' window is a config field (a v5e measurement, not a
    hardcoded law): other hardware re-measures and overrides it."""
    pipe, calls = _spied_tiny_pipe(decode_single_window=(3, 5))
    params = pipe.init_params(jax.random.key(0), image_size=16)
    for n, expect_single in [(2, False), (3, True), (4, True), (5, False)]:
        calls.clear()
        lat = jnp.zeros((n, 2, 2, pipe.vae_cfg.latent_channels), jnp.float32)
        pipe._decode_latents(params, lat)
        assert calls == ([1] if expect_single else [n]), (n, calls)


def test_decode_mode_auto_skips_tiny_vae():
    """'auto' was measured for the FULL 512x512 KL decoder only — the
    taesd path must stay on the native batched decode (round-4 advisor)."""
    pipe, calls = _spied_tiny_pipe(use_tiny_vae=True)
    params = pipe.init_params(jax.random.key(0), image_size=16)
    lat = jnp.zeros((4, 8, 8, pipe.vae_cfg.latent_channels), jnp.float32)
    pipe._decode_latents(params, lat)
    assert calls == [4], calls  # native batched, not per-image


def test_generate_decode_mode_is_per_call_not_mutation(sd_pipe):
    """decode_mode threads through generate() as a STATIC argument so the
    jit cache keys on it — passing a mode never mutates the pipeline and
    never poisons programs traced with a different mode (round-4 advisor
    medium finding: mutation after tracing silently kept the old path)."""
    pipe, params = sd_pipe
    cond = jnp.zeros((2, 16, 16, 3), jnp.float32)
    embeds = pipe.encode_prompt(params, jnp.zeros((2, 77), jnp.int32))
    lat = pipe.init_latents(jax.random.key(3), 2, 16, 16)
    a = pipe.generate(
        params, cond, embeds, lat, num_inference_steps=1,
        decode_mode="single",
    )
    b = pipe.generate(
        params, cond, embeds, lat, num_inference_steps=1,
        decode_mode="batched",
    )
    c = pipe.generate(params, cond, embeds, lat, num_inference_steps=1)
    assert pipe.decode_mode == "auto"
    np.testing.assert_allclose(
        np.asarray(a).astype(np.int32), np.asarray(b).astype(np.int32),
        atol=1,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))  # auto n=2 -> single
