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
)
from genima_tpu.nn.resnet import ResNet18
from genima_tpu.weights.torch_port import (
    export_torch_state_dict,
    load_openai_clip_text,
    port_torch_state_dict,
)


def _roundtrip(params, family):
    sd = export_torch_state_dict(params, family)
    back = port_torch_state_dict(sd, params, family)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    return sd


def test_unet_roundtrip_and_names():
    cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(cfg)
    from genima_tpu.core.init_utils import fast_init

    params = fast_init(
        unet, jax.random.key(0), jnp.zeros((1, 4, 4, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 7, 32)),
    )["params"]
    sd = _roundtrip(params, "diffusers_unet")
    # spot-check diffusers-style key names
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight" in sd
    assert "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight" in sd
    assert "time_embedding.linear_1.weight" in sd
    assert "mid_block.resnets.0.time_emb_proj.weight" in sd
    assert "conv_norm_out.weight" in sd
    # conv kernels exported in torch OIHW layout
    assert sd["conv_in.weight"].shape[-2:] == (3, 3)


def test_controlnet_roundtrip_and_names():
    cfg = UNetConfig.tiny()
    cn = ControlNetModel(cfg, conditioning_scale_channels=(16, 32))
    from genima_tpu.core.init_utils import fast_init

    params = fast_init(
        cn, jax.random.key(0), jnp.zeros((1, 4, 4, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 7, 32)), jnp.zeros((1, 8, 8, 3)),
    )["params"]
    sd = _roundtrip(params, "diffusers_controlnet")
    assert "controlnet_cond_embedding.conv_in.weight" in sd
    assert "controlnet_cond_embedding.blocks.0.weight" in sd
    assert "controlnet_down_blocks.0.weight" in sd
    assert "controlnet_mid_block.weight" in sd


def test_vae_roundtrip_and_names():
    vae = AutoencoderKL(VAEConfig.tiny_test())
    from genima_tpu.core.init_utils import fast_init

    params = fast_init(
        vae, jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jax.random.key(1)
    )["params"]
    sd = _roundtrip(params, "diffusers_vae")
    assert "encoder.down_blocks.0.resnets.0.conv1.weight" in sd
    assert "encoder.down_blocks.0.downsamplers.0.conv.weight" in sd
    assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in sd
    assert "encoder.mid_block.attentions.0.to_q.weight" in sd
    assert "quant_conv.weight" in sd
    assert "post_quant_conv.bias" in sd


def test_clip_roundtrip_and_names():
    clip = CLIPTextModel(CLIPTextConfig.tiny())
    from genima_tpu.core.init_utils import fast_init

    params = fast_init(clip, jax.random.key(0), jnp.zeros((1, 8), jnp.int32))[
        "params"
    ]
    sd = _roundtrip(params, "hf_clip")
    assert "text_model.embeddings.token_embedding.weight" in sd
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in sd
    assert "text_model.encoder.layers.0.mlp.fc1.weight" in sd
    assert "text_model.final_layer_norm.weight" in sd
    assert "text_projection.weight" in sd


def test_resnet_roundtrip_and_names():
    net = ResNet18(width=8)
    from genima_tpu.core.init_utils import fast_init

    params = fast_init(net, jax.random.key(0), jnp.zeros((1, 32, 32, 3)))[
        "params"
    ]
    sd = _roundtrip(params, "torchvision_resnet")
    assert "conv1.weight" in sd
    assert "bn1.running_mean" in sd
    assert "layer1.0.conv1.weight" in sd
    assert "layer2.0.downsample.0.weight" in sd
    assert "layer2.0.downsample.1.running_var" in sd


def test_port_rejects_shape_mismatch():
    clip = CLIPTextModel(CLIPTextConfig.tiny())
    from genima_tpu.core.init_utils import fast_init

    params = fast_init(clip, jax.random.key(0), jnp.zeros((1, 8), jnp.int32))[
        "params"
    ]
    sd = export_torch_state_dict(params, "hf_clip")
    bad = dict(sd)
    bad["text_model.final_layer_norm.weight"] = np.zeros(7)
    with pytest.raises(ValueError):
        port_torch_state_dict(bad, params, "hf_clip")


def test_port_rejects_missing_key():
    clip = CLIPTextModel(CLIPTextConfig.tiny())
    from genima_tpu.core.init_utils import fast_init

    params = fast_init(clip, jax.random.key(0), jnp.zeros((1, 8), jnp.int32))[
        "params"
    ]
    sd = export_torch_state_dict(params, "hf_clip")
    del sd["text_model.final_layer_norm.weight"]
    with pytest.raises(KeyError):
        port_torch_state_dict(sd, params, "hf_clip")


def test_openai_clip_import_fused_qkv():
    cfg = CLIPTextConfig.tiny()
    clip = CLIPTextModel(cfg)
    from genima_tpu.core.init_utils import fast_init

    params = fast_init(clip, jax.random.key(0), jnp.zeros((1, 8), jnp.int32))[
        "params"
    ]
    # build an OpenAI-style state dict with fused in_proj
    rng = np.random.RandomState(0)
    d, inter = cfg.hidden_size, cfg.intermediate_size
    sd = {
        "token_embedding.weight": rng.randn(cfg.vocab_size, d).astype(np.float32),
        "positional_embedding": rng.randn(cfg.max_positions, d).astype(np.float32),
        "ln_final.weight": np.ones(d, np.float32),
        "ln_final.bias": np.zeros(d, np.float32),
        "text_projection": rng.randn(d, cfg.projection_dim).astype(np.float32),
        "visual.ignored": np.zeros(1),
        "logit_scale": np.zeros(()),
    }
    for i in range(cfg.num_layers):
        p = f"transformer.resblocks.{i}."
        sd[p + "attn.in_proj_weight"] = rng.randn(3 * d, d).astype(np.float32)
        sd[p + "attn.in_proj_bias"] = rng.randn(3 * d).astype(np.float32)
        sd[p + "attn.out_proj.weight"] = rng.randn(d, d).astype(np.float32)
        sd[p + "attn.out_proj.bias"] = rng.randn(d).astype(np.float32)
        sd[p + "ln_1.weight"] = np.ones(d, np.float32)
        sd[p + "ln_1.bias"] = np.zeros(d, np.float32)
        sd[p + "ln_2.weight"] = np.ones(d, np.float32)
        sd[p + "ln_2.bias"] = np.zeros(d, np.float32)
        sd[p + "mlp.c_fc.weight"] = rng.randn(inter, d).astype(np.float32)
        sd[p + "mlp.c_fc.bias"] = rng.randn(inter).astype(np.float32)
        sd[p + "mlp.c_proj.weight"] = rng.randn(d, inter).astype(np.float32)
        sd[p + "mlp.c_proj.bias"] = rng.randn(d).astype(np.float32)
    ported = load_openai_clip_text(sd, params)
    # q_proj kernel = first third of in_proj, transposed
    got = np.asarray(ported["layers_0"]["self_attn"]["q_proj"]["kernel"])
    want = sd["transformer.resblocks.0.attn.in_proj_weight"][: cfg.hidden_size].T
    np.testing.assert_array_equal(got, want)
    # text_projection used as x @ W in openai: kernel == original matrix
    np.testing.assert_array_equal(
        np.asarray(ported["text_projection"]["kernel"]), sd["text_projection"]
    )


# ---------------------------------------------------------------------------
# numerical golden tests vs hand-built torch modules
# ---------------------------------------------------------------------------


def test_conv_groupnorm_silu_matches_torch():
    """A diffusers-style resnet block sub-path computed in torch must match
    the flax ResnetBlock2D given ported weights."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    from genima_tpu.nn.layers import ResnetBlock2D

    c = 32

    class TorchBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.GroupNorm(32, c, eps=1e-5)
            self.conv1 = tnn.Conv2d(c, c, 3, padding=1)
            self.norm2 = tnn.GroupNorm(32, c, eps=1e-5)
            self.conv2 = tnn.Conv2d(c, c, 3, padding=1)

        def forward(self, x):
            h = self.conv1(tnn.functional.silu(self.norm1(x)))
            h = self.conv2(tnn.functional.silu(self.norm2(h)))
            return x + h

    tb = TorchBlock().eval()
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}

    block = ResnetBlock2D(c, use_time_emb=False)
    x = np.random.RandomState(0).randn(1, 8, 8, c).astype(np.float32)
    params = block.init(jax.random.key(0), jnp.asarray(x))["params"]
    ported = port_torch_state_dict(sd, params, "diffusers_unet")
    out = block.apply({"params": ported}, jnp.asarray(x))

    with torch.no_grad():
        ref = tb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_clip_layer_matches_torch():
    """CLIP encoder layer vs a torch reimplementation with ported weights."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    cfg = CLIPTextConfig.tiny(num_layers=1)
    clip = CLIPTextModel(cfg)
    ids = np.array([[3, 5, 7, 999]], np.int32)
    params = clip.init(jax.random.key(0), jnp.asarray(ids))["params"]

    d, h, inter = cfg.hidden_size, cfg.num_heads, cfg.intermediate_size

    class TorchCLIPLayer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = tnn.LayerNorm(d)
            self.ln2 = tnn.LayerNorm(d)
            self.attn = tnn.MultiheadAttention(d, h, batch_first=True)
            self.fc1 = tnn.Linear(d, inter)
            self.fc2 = tnn.Linear(inter, d)

        def forward(self, x, mask):
            hh = self.ln1(x)
            a, _ = self.attn(hh, hh, hh, attn_mask=mask)
            x = x + a
            hh = self.ln2(x)
            hh = self.fc2(tnn.functional.gelu(self.fc1(hh)))
            return x + hh

    # build torch layer from flax params (reverse port for one layer)
    tl = TorchCLIPLayer().eval()
    lp = params["layers_0"]

    def t(x):
        return torch.from_numpy(np.asarray(x))

    with torch.no_grad():
        tl.ln1.weight.copy_(t(lp["layer_norm1"]["scale"]))
        tl.ln1.bias.copy_(t(lp["layer_norm1"]["bias"]))
        tl.ln2.weight.copy_(t(lp["layer_norm2"]["scale"]))
        tl.ln2.bias.copy_(t(lp["layer_norm2"]["bias"]))
        qw = np.asarray(lp["self_attn"]["q_proj"]["kernel"]).T
        kw = np.asarray(lp["self_attn"]["k_proj"]["kernel"]).T
        vw = np.asarray(lp["self_attn"]["v_proj"]["kernel"]).T
        tl.attn.in_proj_weight.copy_(t(np.concatenate([qw, kw, vw], 0)))
        qb = np.asarray(lp["self_attn"]["q_proj"]["bias"])
        kb = np.asarray(lp["self_attn"]["k_proj"]["bias"])
        vb = np.asarray(lp["self_attn"]["v_proj"]["bias"])
        tl.attn.in_proj_bias.copy_(t(np.concatenate([qb, kb, vb], 0)))
        tl.attn.out_proj.weight.copy_(t(np.asarray(lp["self_attn"]["out_proj"]["kernel"]).T))
        tl.attn.out_proj.bias.copy_(t(lp["self_attn"]["out_proj"]["bias"]))
        tl.fc1.weight.copy_(t(np.asarray(lp["mlp_fc1"]["kernel"]).T))
        tl.fc1.bias.copy_(t(lp["mlp_fc1"]["bias"]))
        tl.fc2.weight.copy_(t(np.asarray(lp["mlp_fc2"]["kernel"]).T))
        tl.fc2.bias.copy_(t(lp["mlp_fc2"]["bias"]))

    # flax forward of a single layer
    from genima_tpu.nn.clip_text import CLIPEncoderLayer

    x = np.random.RandomState(1).randn(1, 4, d).astype(np.float32)
    s = 4
    causal = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]
    layer = CLIPEncoderLayer(cfg)
    out = layer.apply({"params": lp}, jnp.asarray(x), causal)

    tmask = torch.triu(torch.full((s, s), float("-inf")), diagonal=1)
    with torch.no_grad():
        ref = tl(torch.from_numpy(x), tmask).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_clip_text_matches_real_transformers_goldens():
    """Architecture fidelity pinned to REAL transformers (not the in-repo
    torch_ref): weights, inputs, and activations were generated once by
    transformers.CLIPTextModelWithProjection (v4.57) and committed as
    tests/fixtures/clip_text_golden_hf.npz. Ports the HF state dict through
    the hf_clip mapping and compares last/penultimate hidden states, and
    projected text embeds for both activation variants."""
    from pathlib import Path

    import numpy as np

    from genima_tpu.core.init_utils import fast_init
    from genima_tpu.nn.clip_text import CLIPTextConfig, CLIPTextModel

    fx = np.load(
        Path(__file__).parent / "fixtures" / "clip_text_golden_hf.npz"
    )
    for act in ["quick_gelu", "gelu"]:
        cfg = CLIPTextConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, hidden_act=act, projection_dim=32,
        )
        model = CLIPTextModel(cfg)
        ids = jnp.asarray(fx[f"{act}.ids"])
        params = fast_init(model, jax.random.key(0), ids)["params"]
        sd = {
            k[len(act) + 4:]: np.asarray(v)
            for k, v in fx.items()
            if k.startswith(f"{act}.sd.")
        }
        params = port_torch_state_dict(sd, params, "hf_clip")
        out = model.apply({"params": params}, ids)
        np.testing.assert_allclose(
            np.asarray(out.last_hidden_state),
            fx[f"{act}.last_hidden_state"],
            atol=2e-5, rtol=1e-4, err_msg=f"{act} last_hidden_state",
        )
        np.testing.assert_allclose(
            np.asarray(out.penultimate_hidden_state),
            fx[f"{act}.penultimate"],
            atol=2e-5, rtol=1e-4, err_msg=f"{act} penultimate",
        )
        np.testing.assert_allclose(
            np.asarray(out.text_embeds),
            fx[f"{act}.text_embeds"],
            atol=2e-5, rtol=1e-4, err_msg=f"{act} text_embeds",
        )


def test_export_arrays_are_contiguous():
    """safetensors.numpy.save_file writes raw buffers and silently corrupts
    non-contiguous (transposed-view) arrays — every exported tensor must be
    C-contiguous (regression for the export_controlnet interop path)."""
    from genima_tpu.core.init_utils import fast_init
    from genima_tpu.nn.clip_text import CLIPTextConfig, CLIPTextModel

    clip = CLIPTextModel(CLIPTextConfig.tiny())
    params = fast_init(clip, jax.random.key(0), jnp.zeros((1, 8), jnp.int32))[
        "params"
    ]
    sd = export_torch_state_dict(params, "hf_clip")
    for k, v in sd.items():
        assert np.asarray(v).flags["C_CONTIGUOUS"], k
