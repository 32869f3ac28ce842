import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genima_tpu.nn import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextModel,
    ControlNetModel,
    UNet2DConditionModel,
    UNetConfig,
    VAEConfig,
    controlnet_params_from_unet,
)
from genima_tpu.nn.layers import Attention, get_timestep_embedding


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(cfg)
    key = jax.random.key(0)
    lat = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    t = jnp.array([999.0, 499.0])
    ctx = jax.random.normal(jax.random.key(2), (2, 7, 32))
    params = unet.init(key, lat, t, ctx)
    return cfg, unet, params, lat, t, ctx


def test_timestep_embedding_formula():
    emb = get_timestep_embedding(jnp.array([0.0]), 8)
    # t=0: sin terms are 0, cos terms are 1; flip_sin_to_cos puts cos first
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 0.0, atol=1e-6)
    emb2 = get_timestep_embedding(jnp.array([1.0]), 4)
    # freqs: exp(-ln(10000) * [0,1] / 2) = [1, 1e-2]
    np.testing.assert_allclose(
        np.asarray(emb2[0]),
        [np.cos(1.0), np.cos(1e-2), np.sin(1.0), np.sin(1e-2)],
        atol=1e-6,
    )


def test_attention_matches_manual_softmax():
    attn = Attention(query_dim=16, heads=2)
    x = jax.random.normal(jax.random.key(3), (1, 5, 16))
    params = attn.init(jax.random.key(4), x)
    out = attn.apply(params, x)

    p = params["params"]
    q = x @ p["to_q"]["kernel"]
    k = x @ p["to_k"]["kernel"]
    v = x @ p["to_v"]["kernel"]
    q = q.reshape(1, 5, 2, 8).transpose(0, 2, 1, 3)
    k = k.reshape(1, 5, 2, 8).transpose(0, 2, 1, 3)
    v = v.reshape(1, 5, 2, 8).transpose(0, 2, 1, 3)
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(8)
    probs = jax.nn.softmax(scores, axis=-1)
    ref = np.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(1, 5, 16)
    ref = ref @ p["to_out_0"]["kernel"] + p["to_out_0"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_unet_shapes_and_determinism(tiny_setup):
    cfg, unet, params, lat, t, ctx = tiny_setup
    out = unet.apply(params, lat, t, ctx)
    assert out.shape == (2, 8, 8, 4)
    out2 = unet.apply(params, lat, t, ctx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_unet_timestep_conditioning_matters(tiny_setup):
    cfg, unet, params, lat, t, ctx = tiny_setup
    o1 = unet.apply(params, lat, jnp.array([999.0, 999.0]), ctx)
    o2 = unet.apply(params, lat, jnp.array([1.0, 1.0]), ctx)
    assert float(jnp.abs(o1 - o2).max()) > 1e-4


def test_unet_cross_attention_context_matters(tiny_setup):
    cfg, unet, params, lat, t, ctx = tiny_setup
    o1 = unet.apply(params, lat, t, ctx)
    o2 = unet.apply(params, lat, t, ctx + 1.0)
    assert float(jnp.abs(o1 - o2).max()) > 1e-4


def test_controlnet_residual_structure(tiny_setup):
    cfg, unet, params, lat, t, ctx = tiny_setup
    cn = ControlNetModel(cfg)
    cond = jax.random.uniform(jax.random.key(5), (2, 64, 64, 3))
    cn_params = cn.init(jax.random.key(6), lat, t, ctx, cond)
    down, mid = cn.apply(cn_params, lat, t, ctx, cond)
    # residual count: conv_in + per level (layers + downsample except last)
    # tiny: 1 + (1+1) + 1 = 4
    assert len(down) == 4
    assert down[0].shape == (2, 8, 8, 32)
    assert down[-1].shape == (2, 4, 4, 64)
    assert mid.shape == (2, 4, 4, 64)


def test_controlnet_zero_init_is_identity(tiny_setup):
    """Freshly-initialized ControlNet must not perturb the UNet (zero convs)."""
    cfg, unet, params, lat, t, ctx = tiny_setup
    cn = ControlNetModel(cfg)
    cond = jax.random.uniform(jax.random.key(7), (2, 64, 64, 3))
    cn_params = cn.init(jax.random.key(8), lat, t, ctx, cond)
    down, mid = cn.apply(cn_params, lat, t, ctx, cond)
    for d in down:
        np.testing.assert_array_equal(np.asarray(d), 0.0)
    np.testing.assert_array_equal(np.asarray(mid), 0.0)
    base = unet.apply(params, lat, t, ctx)
    injected = unet.apply(
        params, lat, t, ctx,
        down_block_additional_residuals=down,
        mid_block_additional_residual=mid,
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(injected), atol=1e-6)


def test_controlnet_from_unet_copies_shared_params(tiny_setup):
    cfg, unet, params, lat, t, ctx = tiny_setup
    cn = ControlNetModel(cfg)
    cond = jnp.zeros((2, 64, 64, 3))
    cn_params = cn.init(jax.random.key(9), lat, t, ctx, cond)["params"]
    merged = controlnet_params_from_unet(params["params"], cn_params)
    for key in ["conv_in", "time_embedding", "down_blocks_0", "mid_block"]:
        ref_leaf = jax.tree_util.tree_leaves(params["params"][key])[0]
        got_leaf = jax.tree_util.tree_leaves(merged[key])[0]
        np.testing.assert_array_equal(np.asarray(ref_leaf), np.asarray(got_leaf))
    # controlnet-only trees are untouched
    assert "controlnet_cond_embedding" in merged
    assert "controlnet_down_blocks_0" in merged


def test_controlnet_injection_changes_output(tiny_setup):
    cfg, unet, params, lat, t, ctx = tiny_setup
    down, mid = [], None
    cn = ControlNetModel(cfg)
    cond = jax.random.uniform(jax.random.key(10), (2, 64, 64, 3))
    variables = cn.init(jax.random.key(11), lat, t, ctx, cond)
    # make the zero convs non-zero to simulate a trained controlnet
    p = jax.tree_util.tree_map(lambda x: x + 0.01, variables["params"])
    down, mid = cn.apply({"params": p}, lat, t, ctx, cond)
    base = unet.apply(params, lat, t, ctx)
    injected = unet.apply(
        params, lat, t, ctx,
        down_block_additional_residuals=down,
        mid_block_additional_residual=mid,
    )
    assert float(jnp.abs(base - injected).max()) > 1e-5


def test_pix2pix_unet_8ch_input():
    cfg = UNetConfig.tiny(in_channels=8)
    unet = UNet2DConditionModel(cfg)
    lat = jnp.zeros((1, 8, 8, 8))
    params = unet.init(jax.random.key(12), lat, jnp.array([1.0]), jnp.zeros((1, 7, 32)))
    out = unet.apply(params, lat, jnp.array([1.0]), jnp.zeros((1, 7, 32)))
    assert out.shape == (1, 8, 8, 4)


def test_sdxl_text_time_conditioning():
    cfg = UNetConfig.tiny(
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
    )
    unet = UNet2DConditionModel(cfg)
    lat = jnp.zeros((2, 8, 8, 4))
    t = jnp.array([1.0, 1.0])
    ctx = jnp.zeros((2, 7, 32))
    added = {
        "text_embeds": jnp.ones((2, 16)),
        "time_ids": jnp.tile(jnp.array([[512, 512, 0, 0, 512, 512]]), (2, 1)),
    }
    params = unet.init(jax.random.key(13), lat, t, ctx, added_cond_kwargs=added)
    o1 = unet.apply(params, lat, t, ctx, added_cond_kwargs=added)
    added2 = dict(added, text_embeds=jnp.zeros((2, 16)))
    o2 = unet.apply(params, lat, t, ctx, added_cond_kwargs=added2)
    assert o1.shape == (2, 8, 8, 4)
    assert float(jnp.abs(o1 - o2).max()) > 1e-5


def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny_test()
    vae = AutoencoderKL(cfg)
    img = jax.random.uniform(jax.random.key(14), (1, 32, 32, 3), minval=-1, maxval=1)
    params = vae.init(jax.random.key(15), img, jax.random.key(16))
    dist = vae.apply(params, img, method=vae.encode)
    # 2 levels -> one stride-2 downsample -> 16x16 latents
    assert dist.mean.shape == (1, 16, 16, 4)
    assert dist.logvar.shape == (1, 16, 16, 4)
    z = dist.sample(jax.random.key(17))
    rec = vae.apply(params, z, method=vae.decode)
    assert rec.shape == (1, 32, 32, 3)


def test_vae_sd_latent_geometry():
    """SD VAE downsamples 8x: 512 -> 64 latents (the 2x2-tile trick's token
    budget: 64x64=4096 tokens at the base attention level)."""
    cfg = VAEConfig.sd()
    assert len(cfg.block_out_channels) == 4  # 3 downsamples = 8x
    assert cfg.scaling_factor == 0.18215


def test_clip_causal_mask():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids = jnp.array([[3, 5, 7, 9, 999] + [0] * 72], jnp.int32)
    params = model.init(jax.random.key(18), ids)
    out1 = model.apply(params, ids)
    # change a later token; earlier positions must be unaffected (causal)
    ids2 = ids.at[0, 3].set(42)
    out2 = model.apply(params, ids2)
    np.testing.assert_allclose(
        np.asarray(out1.last_hidden_state[0, :3]),
        np.asarray(out2.last_hidden_state[0, :3]),
        atol=1e-6,
    )
    assert float(jnp.abs(out1.last_hidden_state[0, 3:5] - out2.last_hidden_state[0, 3:5]).max()) > 1e-6


def test_clip_pooled_at_eot():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    # EOT (highest id 999) at position 2
    ids = jnp.array([[3, 5, 999, 0, 0]], jnp.int32)
    params = model.init(jax.random.key(19), ids)
    out = model.apply(params, ids)
    np.testing.assert_allclose(
        np.asarray(out.pooled_output[0]),
        np.asarray(out.last_hidden_state[0, 2]),
        atol=1e-6,
    )


def test_clip_penultimate_differs_from_last():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids = jnp.array([[3, 5, 999]], jnp.int32)
    params = model.init(jax.random.key(20), ids)
    out = model.apply(params, ids)
    assert out.penultimate_hidden_state.shape == out.last_hidden_state.shape
    assert float(jnp.abs(out.penultimate_hidden_state - out.last_hidden_state).max()) > 1e-6


def test_unet_jit_compiles(tiny_setup):
    cfg, unet, params, lat, t, ctx = tiny_setup
    fn = jax.jit(lambda p, x, tt, c: unet.apply(p, x, tt, c))
    out = fn(params, lat, t, ctx)
    assert out.shape == (2, 8, 8, 4)


def test_controlnet_precomputed_cond_embedding_matches(tiny_setup):
    """cond_is_embedded=True with embed_conditioning() (the denoise-loop
    hoist) is numerically identical to the raw conditioning path."""
    from genima_tpu.nn.controlnet import embed_conditioning

    cfg, unet, params, lat, t, ctx = tiny_setup
    cn = ControlNetModel(cfg)
    cond = jax.random.uniform(jax.random.key(5), (2, 64, 64, 3))
    cn_params = cn.init(jax.random.key(6), lat, t, ctx, cond)["params"]
    # make the zero-init cond-embedding conv_out non-trivial
    cn_params = jax.tree_util.tree_map(
        lambda a: a + 0.01, cn_params
    )
    down_raw, mid_raw = cn.apply({"params": cn_params}, lat, t, ctx, cond)
    emb = embed_conditioning(
        cfg, cn.conditioning_scale_channels, cn.dtype, cn_params, cond
    )
    down_pre, mid_pre = cn.apply(
        {"params": cn_params}, lat, t, ctx, emb, cond_is_embedded=True
    )
    np.testing.assert_allclose(
        np.asarray(mid_raw), np.asarray(mid_pre), atol=1e-6
    )
    for a, b in zip(down_raw, down_pre):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
