"""Golden-activation fixtures for the three diffusion models.

The released Genima checkpoints load ``diffusers`` UNet2DConditionModel,
ControlNetModel and AutoencoderKL (reference
``diffusion/train_controlnet_genima.py:1042-1071``); matching their
numerics is the weight-port fidelity requirement (SURVEY.md §7). The CLIP
text tower is already pinned by vendored REAL-transformers goldens
(``tests/fixtures/clip_text_golden_hf.npz``); this module gives the three
diffusion models the same treatment:

* ``scripts/make_diffusers_goldens.py`` (run ONCE on any machine with
  ``diffusers`` installed — this offline image has none and zero egress)
  builds the tiny-config diffusers models below, runs fixed-input
  forwards, and writes ``tests/fixtures/diffusers_goldens.npz``.
* ``tests/test_diffusers_goldens.py`` loads the fixture, ports the saved
  torch state dicts through :func:`genima_tpu.weights.torch_port.
  port_torch_state_dict`, and asserts our forwards reproduce the golden
  activations — with no torch or diffusers installed.

Until the real fixture is generated, the same test path runs against a
self-generated fixture (our models exported through the identical
writer/schema), which proves the ENTIRE harness — schema, port mapping
coverage, forward plumbing, tolerances — end to end; the networked
machine then only swaps in real diffusers values.

The tiny configs are chosen so every dimension is expressible in the
diffusers constructors (32-divisible channels keep GroupNorm at the
diffusers default of 32 groups).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

GOLDENS_PATH = (
    Path(__file__).resolve().parents[2]
    / "tests" / "fixtures" / "diffusers_goldens.npz"
)

CONDITIONING_SCALE = 0.7
CN_COND_CHANNELS = (8, 16)

# ours -> UNetConfig kwargs; diffusers -> UNet2DConditionModel kwargs.
# NOTE diffusers' `attention_head_dim` historically holds the per-block
# head COUNT for SD-family configs (sd-turbo ships [5, 10, 20, 20]); our
# `num_heads` is the same quantity.
TINY_UNET = {
    "ours": dict(
        sample_size=8,
        block_out_channels=(32, 64),
        down_block_has_attn=(True, False),
        layers_per_block=1,
        num_heads=(2, 2),
        transformer_layers_per_block=(1, 1),
        cross_attention_dim=32,
    ),
    "diffusers": dict(
        sample_size=8,
        in_channels=4,
        out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(32, 64),
        layers_per_block=1,
        attention_head_dim=(2, 2),
        cross_attention_dim=32,
        use_linear_projection=True,
        norm_num_groups=32,
    ),
}

TINY_VAE = {
    "ours": dict(block_out_channels=(32, 32), layers_per_block=1),
    "diffusers": dict(
        in_channels=3,
        out_channels=3,
        latent_channels=4,
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
        block_out_channels=(32, 32),
        layers_per_block=1,
        norm_num_groups=32,
    ),
}


def golden_inputs() -> dict:
    """Fixed forward inputs, stored NCHW (the torch layout) on disk."""
    rng = np.random.RandomState(0)
    return {
        "sample": rng.randn(2, 4, 8, 8).astype(np.float32),
        "t": np.array([999.0, 17.0], np.float32),
        "ctx": rng.randn(2, 4, 32).astype(np.float32),
        "cond": rng.rand(2, 3, 16, 16).astype(np.float32),
        "image": (rng.rand(2, 3, 16, 16) * 2.0 - 1.0).astype(np.float32),
        "latents": rng.randn(2, 4, 8, 8).astype(np.float32),
    }


def save_goldens(path, source: str, state_dicts: dict, outputs: dict) -> None:
    """Flat npz: ``meta/source``, ``sd/<model>/<torch key>``,
    ``out/<name>``. ``state_dicts`` maps model name -> torch-layout state
    dict (numpy); ``outputs`` maps output name -> NCHW numpy array."""
    flat = {"meta/source": np.str_(source)}
    for model, sd in state_dicts.items():
        for k, v in sd.items():
            flat[f"sd/{model}/{k}"] = np.asarray(v)
    for k, v in outputs.items():
        flat[f"out/{k}"] = np.asarray(v)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


def load_goldens(path) -> tuple[str, dict, dict]:
    """Inverse of :func:`save_goldens`."""
    with np.load(path) as z:
        source = str(z["meta/source"])
        sds: dict = {}
        outs: dict = {}
        for k in z.files:
            if k.startswith("sd/"):
                _, model, torch_key = k.split("/", 2)
                sds.setdefault(model, {})[torch_key] = z[k]
            elif k.startswith("out/"):
                outs[k[4:]] = z[k]
    return source, sds, outs


# ---------------------------------------------------------------------------
# our side: build models, port state dicts, run the golden forwards
# ---------------------------------------------------------------------------


def _build_ours():
    import jax
    import jax.numpy as jnp

    from genima_tpu.core.init_utils import fast_init
    from genima_tpu.nn.controlnet import ControlNetModel
    from genima_tpu.nn.unet import UNet2DConditionModel, UNetConfig
    from genima_tpu.nn.vae import AutoencoderKL, VAEConfig

    ucfg = UNetConfig(**TINY_UNET["ours"])
    unet = UNet2DConditionModel(ucfg)
    uparams = fast_init(
        unet, jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 4, ucfg.cross_attention_dim)), seed=31,
    )["params"]

    cn = ControlNetModel(ucfg, conditioning_scale_channels=CN_COND_CHANNELS)
    cparams = fast_init(
        cn, jax.random.key(1), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 4, ucfg.cross_attention_dim)),
        jnp.zeros((1, 16, 16, 3)), seed=32,
    )["params"]

    vcfg = VAEConfig(**TINY_VAE["ours"])
    vae = AutoencoderKL(vcfg)
    vparams = fast_init(
        vae, jax.random.key(2), jnp.zeros((1, 16, 16, 3)),
        jax.random.key(3), seed=33,
    )["params"]
    return (unet, uparams), (cn, cparams), (vae, vparams)


def run_ours(state_dicts: dict) -> dict:
    """Port the torch-layout ``state_dicts`` onto our tiny models and run
    the golden forwards. Returns outputs in NCHW (the on-disk layout)."""
    import jax.numpy as jnp

    from genima_tpu.weights.torch_port import port_torch_state_dict

    (unet, uparams), (cn, cparams), (vae, vparams) = _build_ours()
    uparams = port_torch_state_dict(
        state_dicts["unet"], uparams, "diffusers_unet"
    )
    cparams = port_torch_state_dict(
        state_dicts["controlnet"], cparams, "diffusers_controlnet"
    )
    vparams = port_torch_state_dict(
        state_dicts["vae"], vparams, "diffusers_vae"
    )

    x = golden_inputs()
    nhwc = lambda a: jnp.asarray(np.asarray(a).transpose(0, 2, 3, 1))  # noqa: E731
    nchw = lambda a: np.asarray(a).transpose(0, 3, 1, 2)  # noqa: E731
    sample, t, ctx = nhwc(x["sample"]), jnp.asarray(x["t"]), jnp.asarray(x["ctx"])

    eps_plain = unet.apply({"params": uparams}, sample, t, ctx)

    down, mid = cn.apply(
        {"params": cparams}, sample, t, ctx, nhwc(x["cond"]),
        conditioning_scale=CONDITIONING_SCALE,
    )
    eps_injected = unet.apply(
        {"params": uparams}, sample, t, ctx,
        down_block_additional_residuals=down,
        mid_block_additional_residual=mid,
    )

    dist = vae.apply({"params": vparams}, nhwc(x["image"]), method=vae.encode)
    decoded = vae.apply({"params": vparams}, nhwc(x["latents"]), method=vae.decode)

    outs = {
        "unet_eps": nchw(eps_plain),
        "controlnet_mid": nchw(mid),
        "combined_eps": nchw(eps_injected),
        "vae_mean": nchw(dist.mean),
        "vae_std": nchw(jnp.exp(0.5 * dist.logvar)),
        "vae_decoded": nchw(decoded),
    }
    for i, d in enumerate(down):
        outs[f"controlnet_down{i}"] = nchw(d)
    return outs


def make_self_goldens(path) -> None:
    """Write a fixture from OUR OWN models through the exact schema the
    diffusers script uses — the harness-validation stand-in until the real
    ``diffusers_goldens.npz`` is generated (see module docstring)."""
    from genima_tpu.weights.torch_port import export_torch_state_dict

    (unet, uparams), (cn, cparams), (vae, vparams) = _build_ours()
    sds = {
        "unet": export_torch_state_dict(uparams, "diffusers_unet"),
        "controlnet": export_torch_state_dict(cparams, "diffusers_controlnet"),
        "vae": export_torch_state_dict(vparams, "diffusers_vae"),
    }
    outs = run_ours(sds)
    save_goldens(path, "self", sds, outs)
