"""Convert torch checkpoints to the native TPU format (and back).

Covers the external weights the Genima flow needs (SURVEY.md §2.2):

* SD-turbo / SDXL-turbo base models (diffusers layout: unet/ vae/
  text_encoder/ [text_encoder_2/] subdirs with safetensors),
* released Genima ControlNet checkpoints (``checkpoint-*/controlnet`` or a
  final controlnet dir),
* OpenAI CLIP ViT-B/32 (text tower, for the controller),
* torchvision resnet18 (the controller's image backbone).

Usage:
    python -m genima_tpu.cli.convert_checkpoint sd_base \
        --src /path/sd-turbo --dst /path/sd-turbo-tpu
    python -m genima_tpu.cli.convert_checkpoint controlnet \
        --src /path/checkpoint-15000/controlnet --dst /ckpt/controlnet
    python -m genima_tpu.cli.convert_checkpoint export_controlnet \
        --src /ckpt/controlnet --dst /out/controlnet_diffusers   # reverse
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax

from genima_tpu.core import checkpoint as ckpt


def convert_sd_base(src: Path, dst: Path, sdxl: bool = False) -> None:
    import jax.numpy as jnp

    from genima_tpu.diffusion.pipeline import (
        SDControlNetPipeline,
        SDXLControlNetPipeline,
    )
    from genima_tpu.weights.load_pretrained import load_pretrained_pipeline

    pipe = (SDXLControlNetPipeline if sdxl else SDControlNetPipeline)(
        dtype=jnp.float32
    )
    params = pipe.init_params(jax.random.key(0), image_size=512)
    report = load_pretrained_pipeline(src, params)
    print(f"loaded: {report}")
    for name, p in params.items():
        if name == "controlnet" and report.get(name) in (None, "missing"):
            continue  # base models ship no controlnet
        ckpt.save_pytree(p, dst / name / "params.msgpack")
        print(f"wrote {dst / name / 'params.msgpack'}")


def convert_submodel(src: Path, dst: Path, family: str, builder) -> None:
    from genima_tpu.weights.load_pretrained import load_submodel

    target = builder()
    loaded, kind = load_submodel(src, target, family)
    if loaded is None:
        raise FileNotFoundError(f"no weights found under {src}")
    ckpt.save_pytree(loaded, dst / "params.msgpack")
    print(f"wrote {dst / 'params.msgpack'} (from {kind})")


def _controlnet_target():
    import jax.numpy as jnp

    from genima_tpu.core.init_utils import fast_init
    from genima_tpu.nn.controlnet import ControlNetModel
    from genima_tpu.nn.unet import UNetConfig

    cn = ControlNetModel(UNetConfig.sd21(), dtype=jnp.float32)
    return fast_init(
        cn, jax.random.key(0),
        jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,)), jnp.zeros((1, 77, 1024)),
        jnp.zeros((1, 512, 512, 3)),
    )["params"]


def export_controlnet(src: Path, dst: Path) -> None:
    """Native controlnet -> diffusers-layout safetensors (interop export)."""
    from safetensors.numpy import save_file

    from genima_tpu.weights.torch_port import export_torch_state_dict

    params = ckpt.load_pytree(src / "params.msgpack")
    sd = export_torch_state_dict(params, "diffusers_controlnet")
    dst.mkdir(parents=True, exist_ok=True)
    save_file(sd, str(dst / "diffusion_pytorch_model.safetensors"))
    print(f"wrote {dst / 'diffusion_pytorch_model.safetensors'}")


def convert_clip(src: Path, dst: Path) -> None:
    import jax.numpy as jnp

    from genima_tpu.core.init_utils import fast_init
    from genima_tpu.nn.clip_text import CLIPTextConfig, CLIPTextModel
    from genima_tpu.weights.torch_port import load_openai_clip_text, load_torch_file

    model = CLIPTextModel(CLIPTextConfig.vit_b_32())
    target = fast_init(
        model, jax.random.key(0), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    sd = load_torch_file(src)
    ported = load_openai_clip_text(sd, target)
    ckpt.save_pytree(ported, dst / "params.msgpack")
    print(f"wrote {dst / 'params.msgpack'}")


def convert_taesd(src: Path, dst: Path) -> None:
    """Upstream taesd (taesd_encoder/decoder.pth, a merged dict, or a
    diffusers AutoencoderTiny file) -> native tiny-VAE params."""
    import jax.numpy as jnp

    from genima_tpu.core.init_utils import fast_init
    from genima_tpu.nn.vae import AutoencoderTiny
    from genima_tpu.weights.torch_port import load_taesd, load_torch_file

    if src.is_dir():
        sd = {}
        for tower in ("encoder", "decoder"):
            f = next(iter(src.glob(f"*{tower}*.pt*")), None) or next(
                iter(src.glob(f"*{tower}*.safetensors")), None
            )
            if f is None:
                raise FileNotFoundError(f"no taesd_{tower} file under {src}")
            sd.update({f"{tower}.{k}": v for k, v in load_torch_file(f).items()})
    else:
        sd = load_torch_file(src)
    tiny = AutoencoderTiny()
    target = fast_init(tiny, jax.random.key(0), jnp.zeros((1, 64, 64, 3)))[
        "params"
    ]
    ported = load_taesd(sd, target)
    ckpt.save_pytree(ported, dst / "params.msgpack")
    print(f"wrote {dst / 'params.msgpack'}")


def convert_resnet(src: Path, dst: Path) -> None:
    import jax.numpy as jnp

    from genima_tpu.core.init_utils import fast_init
    from genima_tpu.nn.resnet import ResNet18
    from genima_tpu.weights.torch_port import load_torch_file, port_torch_state_dict

    net = ResNet18()
    target = fast_init(net, jax.random.key(0), jnp.zeros((1, 256, 256, 3)))[
        "params"
    ]
    sd = load_torch_file(src)
    sd = {k: v for k, v in sd.items() if not k.startswith("fc.")}
    ported = port_torch_state_dict(sd, target, "torchvision_resnet", strict=False)
    ckpt.save_pytree(ported, dst / "params.msgpack")
    print(f"wrote {dst / 'params.msgpack'}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "kind",
        choices=[
            "sd_base", "sdxl_base", "controlnet", "export_controlnet",
            "clip_vit_b32", "resnet18", "taesd",
        ],
    )
    p.add_argument("--src", type=Path, required=True)
    p.add_argument("--dst", type=Path, required=True)
    args = p.parse_args(argv)

    if args.kind == "sd_base":
        convert_sd_base(args.src, args.dst, sdxl=False)
    elif args.kind == "sdxl_base":
        convert_sd_base(args.src, args.dst, sdxl=True)
    elif args.kind == "controlnet":
        convert_submodel(
            args.src, args.dst, "diffusers_controlnet", _controlnet_target
        )
    elif args.kind == "export_controlnet":
        export_controlnet(args.src, args.dst)
    elif args.kind == "clip_vit_b32":
        convert_clip(args.src, args.dst)
    elif args.kind == "resnet18":
        convert_resnet(args.src, args.dst)
    elif args.kind == "taesd":
        convert_taesd(args.src, args.dst)


if __name__ == "__main__":
    main()
