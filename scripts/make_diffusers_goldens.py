"""Generate tests/fixtures/diffusers_goldens.npz from REAL diffusers.

Run ONCE on any machine with ``diffusers`` + ``torch`` installed (this
offline image has neither diffusers nor egress), then commit the npz:

    PYTHONPATH=/path/to/repo python scripts/make_diffusers_goldens.py

``tests/test_diffusers_goldens.py`` then pins our tiny UNet2DCondition /
ControlNet(+residual injection) / AutoencoderKL forwards to the real
library's activations offline — the same treatment the CLIP text tower
already has (``tests/fixtures/clip_text_golden_hf.npz``). Configs,
inputs, and the npz schema are shared with the test through
``genima_tpu.weights.goldens`` so the two sides cannot drift.

Reference being matched: the models the released Genima checkpoints load,
``diffusion/train_controlnet_genima.py:1042-1071``.
"""

from __future__ import annotations

import numpy as np
import torch

from genima_tpu.weights.goldens import (
    CN_COND_CHANNELS,
    CONDITIONING_SCALE,
    GOLDENS_PATH,
    TINY_UNET,
    TINY_VAE,
    golden_inputs,
    save_goldens,
)


def main() -> None:
    import diffusers

    torch.manual_seed(0)
    unet = diffusers.UNet2DConditionModel(**TINY_UNET["diffusers"]).eval()
    controlnet = diffusers.ControlNetModel.from_unet(
        unet, conditioning_embedding_out_channels=CN_COND_CHANNELS
    ).eval()
    # zero convs would zero every residual; randomize them so the goldens
    # exercise the injection path (mirrors tests/test_full_model_parity.py)
    with torch.no_grad():
        for name, p in controlnet.named_parameters():
            if "controlnet_" in name and p.abs().sum() == 0:
                p.normal_(0.0, 0.1)
    vae = diffusers.AutoencoderKL(**TINY_VAE["diffusers"]).eval()

    x = golden_inputs()
    sample = torch.from_numpy(x["sample"])
    t = torch.from_numpy(x["t"])
    ctx = torch.from_numpy(x["ctx"])
    cond = torch.from_numpy(x["cond"])
    image = torch.from_numpy(x["image"])
    latents = torch.from_numpy(x["latents"])

    with torch.no_grad():
        eps_plain = unet(sample, t, encoder_hidden_states=ctx).sample
        down, mid = controlnet(
            sample,
            t,
            encoder_hidden_states=ctx,
            controlnet_cond=cond,
            conditioning_scale=CONDITIONING_SCALE,
            return_dict=False,
        )
        eps_injected = unet(
            sample,
            t,
            encoder_hidden_states=ctx,
            down_block_additional_residuals=down,
            mid_block_additional_residual=mid,
        ).sample
        dist = vae.encode(image).latent_dist
        decoded = vae.decode(latents).sample

    outs = {
        "unet_eps": eps_plain.numpy(),
        "controlnet_mid": mid.numpy(),
        "combined_eps": eps_injected.numpy(),
        "vae_mean": dist.mean.numpy(),
        "vae_std": dist.std.numpy(),
        "vae_decoded": decoded.numpy(),
    }
    for i, d in enumerate(down):
        outs[f"controlnet_down{i}"] = d.numpy()

    sds = {
        name: {k: v.numpy() for k, v in m.state_dict().items()}
        for name, m in (
            ("unet", unet), ("controlnet", controlnet), ("vae", vae),
        )
    }
    save_goldens(
        GOLDENS_PATH, f"diffusers-{diffusers.__version__}", sds, outs
    )
    total = sum(np.asarray(v).size for sd in sds.values() for v in sd.values())
    print(f"wrote {GOLDENS_PATH} ({total} weight scalars)")


if __name__ == "__main__":
    main()
